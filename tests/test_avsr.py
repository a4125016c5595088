"""AVSR family tests on a tiny config: features, encoder, decoder, generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.avsr import (
    AVHubertConfig,
    AVHubertFeatureExtractor,
    AVHubertForConditionalGeneration,
    AVHubertModel,
    AVHubertProcessor,
)
from reazonspeech_tpu.avsr.feature_extraction import logfbank, stack_features
from reazonspeech_tpu.avsr.model import decode_logits, greedy_generate
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny():
    cfg = AVHubertConfig.tiny(audio_feat_dim=104)
    model = AVHubertForConditionalGeneration.init(jax.random.PRNGKey(0), cfg)
    return cfg, model


def test_logfbank_shapes():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    fb = logfbank(wav)
    # 100 Hz frames: ceil((16000-400)/160)+1 = 99
    assert fb.shape == (99, 26)
    assert np.isfinite(fb).all()


def test_stack_features():
    f = np.arange(10 * 26, dtype=np.float32).reshape(10, 26)
    s = stack_features(f, 4)
    assert s.shape == (3, 104)
    np.testing.assert_array_equal(s[0, :26], f[0])
    np.testing.assert_array_equal(s[0, 78:], f[3])


def test_extractor_audio_only():
    fe = AVHubertFeatureExtractor()
    wavs = [np.zeros(16000, np.float32), np.zeros(8000, np.float32)]
    out = fe(audios=wavs)
    assert out["audio_feats"].shape[0] == 2
    assert out["audio_feats"].shape[2] == 104
    assert out["video_frames"] is None
    assert out["padding_mask"].shape == out["audio_feats"].shape[:2]
    assert out["lengths"][0] > out["lengths"][1]


def test_extractor_av_alignment():
    fe = AVHubertFeatureExtractor()
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32)]
    videos = [rng.integers(0, 255, (12, 96, 96)).astype(np.float32)]
    out = fe(audios=wavs, videos=videos)
    # video resampled to audio step count
    assert out["video_frames"].shape[1] == out["audio_feats"].shape[1]
    assert out["video_frames"].shape[2:] == (88, 88)


def test_encoder_modality_combinations(tiny):
    cfg, model = tiny
    rng = np.random.default_rng(0)
    b, t = 2, 7
    audio = rng.standard_normal((b, t, cfg.audio_feat_dim)).astype(np.float32)
    video = rng.standard_normal((b, t, 88, 88)).astype(np.float32)
    enc_model = AVHubertModel(config=cfg, params=model.params)

    ha, _ = enc_model(audio=audio)
    hv, _ = enc_model(video=video)
    hav, mask = enc_model(audio=audio, video=video)
    assert ha.shape == hv.shape == hav.shape == (b, t, cfg.hidden_size)
    assert np.isfinite(np.asarray(hav)).all()
    # modalities actually change the output
    assert not np.allclose(np.asarray(ha), np.asarray(hav), atol=1e-4)

    with pytest.raises(ValueError):
        enc_model()


def test_decoder_teacher_forcing(tiny):
    cfg, model = tiny
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 6, cfg.audio_feat_dim)).astype(np.float32)
    dec_in = rng.integers(0, cfg.vocab_size, (2, 5)).astype(np.int32)
    logits = model.forward_logits(dec_in, audio=audio)
    assert logits.shape == (2, 5, cfg.vocab_size)
    loss = model.loss(dec_in, dec_in, audio=audio)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_causality(tiny):
    """Changing a later decoder token must not affect earlier logits."""
    cfg, model = tiny
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 6, cfg.audio_feat_dim)).astype(np.float32)
    ids1 = np.array([[1, 2, 3, 4]], np.int32)
    ids2 = np.array([[1, 2, 9, 9]], np.int32)
    l1 = np.asarray(model.forward_logits(ids1, audio=audio))
    l2 = np.asarray(model.forward_logits(ids2, audio=audio))
    np.testing.assert_allclose(l1[0, :2], l2[0, :2], atol=1e-4)
    assert not np.allclose(l1[0, 2:], l2[0, 2:], atol=1e-4)


def test_greedy_matches_teacher_forcing_step(tiny):
    """Greedy generate's first token must equal argmax of the teacher-forced
    logits at BOS (validates the KV-cache step path against decode_logits)."""
    cfg, model = tiny
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 6, cfg.audio_feat_dim)).astype(np.float32)
    enc, mask = model.encoder(audio=audio)
    out = greedy_generate(model.params, cfg, enc, mask, max_length=8)
    bos = np.full((2, 1), cfg.bos_token_id, np.int32)
    tf_logits = decode_logits(model.params, cfg, jnp.asarray(bos), enc, mask)
    first = np.asarray(jnp.argmax(tf_logits[:, 0], axis=-1))
    np.testing.assert_array_equal(np.asarray(out[:, 0]), first)


def test_generate_greedy_and_beam(tiny):
    cfg, model = tiny
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((2, 6, cfg.audio_feat_dim)).astype(np.float32)
    g = model.generate(audio=audio, num_beams=1, max_length=10)
    b = model.generate(audio=audio, num_beams=3, max_length=10)
    assert g.shape == (2, 10)
    assert b.shape == (2, 10)
    assert (np.asarray(g) >= 0).all() and (np.asarray(g) < cfg.vocab_size).all()
    assert (np.asarray(b) >= 0).all() and (np.asarray(b) < cfg.vocab_size).all()


@pytest.mark.parametrize("eos_factor", [1.0, 1.5])
def test_beam_generate_matches_hf_semantics_oracle(eos_factor):
    """generate(num_beams=5) == the serial HF-BeamSearchScorer oracle
    (tools/torch_reference.py:avhubert_beam_reference) token-for-token.
    eos_factor=1.5 reshapes the eos embedding so EOS candidates rank inside
    the top beam — exercising the hypothesis banking / worst-replacement
    pool, not just the plain beam path."""
    import os
    import sys
    import tempfile

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fixture_checkpoints import write_avhubert_hf_dir
    from torch_reference import avhubert_beam_reference, avhubert_encoder_forward

    from reazonspeech_tpu.avsr.model import AVHubertForConditionalGeneration

    with tempfile.TemporaryDirectory() as td:
        cfg = AVHubertConfig.tiny(audio_feat_dim=104)
        write_avhubert_hf_dir(td, cfg)
        sd_path = os.path.join(td, "pytorch_model.bin")
        sd = torch.load(sd_path, map_location="cpu", weights_only=True)
        if eos_factor != 1.0:
            key = "model.decoder.embed_tokens.weight"
            sd[key] = sd[key].clone()
            sd[key][cfg.eos_token_id] = sd[key][36] * eos_factor
            torch.save(sd, sd_path)
        model = AVHubertForConditionalGeneration.from_pretrained(td)
        sd = {k: v.float() for k, v in sd.items()}

    rng = np.random.default_rng(10)
    for _ in range(2):
        audio = rng.standard_normal((24, cfg.audio_feat_dim)).astype(np.float32)
        with torch.no_grad():
            ref_enc = avhubert_encoder_forward(sd, cfg, torch.from_numpy(audio))
            ref = avhubert_beam_reference(sd, cfg, ref_enc, num_beams=5,
                                          max_length=9)
        out = np.asarray(
            model.generate(audio=audio[None], num_beams=5, max_length=8))[0]
        ours = []
        for tok in out.tolist():
            ours.append(int(tok))
            if tok == cfg.eos_token_id:
                break
        assert ours == ref[1:]


def test_processor_targets(tiny):
    cfg, _ = tiny
    from reazonspeech_tpu.core.tokenizer import CharTokenizer

    tok = CharTokenizer(["<s>", "</s>", "あ", "い", "う"])
    tok.types[0] = 3
    tok.types[1] = 3

    class TokAdapter:
        pad_token_id = 0

        def encode(self, text, add_special_tokens=False):
            ids = []
            i = 0
            while i < len(text):
                if text.startswith("<s>", i):
                    ids.append(0)
                    i += 3
                elif text.startswith("</s>", i):
                    ids.append(1)
                    i += 4
                else:
                    ids.append(tok.piece_to_id[text[i]])
                    i += 1
            return ids

        def decode(self, ids, skip_special_tokens=True):
            return tok.ids_to_text(list(ids))

    proc = AVHubertProcessor(tokenizer=TokAdapter())
    out = proc(audios=[np.zeros(8000, np.float32)], text="あいう")
    # <s> あ い う </s> -> inputs drop last, labels drop first
    np.testing.assert_array_equal(out["decoder_input_ids"][0], [0, 2, 3, 4])
    np.testing.assert_array_equal(out["labels"][0], [2, 3, 4, 1])


def test_resnet3d_shapes():
    from reazonspeech_tpu.avsr.resnet3d import init_resnet3d, resnet3d_apply

    p = init_resnet3d(jax.random.PRNGKey(0))
    video = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 5, 88, 88)), jnp.float32
    )
    out = resnet3d_apply(p, video)
    assert out.shape == (1, 5, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_hybrid_ctc_loss(tiny):
    """ctc_loss_weight>0 adds the auxiliary encoder-CTC term; both variants
    must be finite and differ."""
    cfg_ctc = AVHubertConfig.tiny(audio_feat_dim=104, ctc_loss_weight=0.3)
    m_ctc = AVHubertForConditionalGeneration.init(jax.random.PRNGKey(0), cfg_ctc)
    assert "ctc_head" in m_ctc.params

    cfg0 = AVHubertConfig.tiny(audio_feat_dim=104, ctc_loss_weight=0.0)
    m0 = AVHubertForConditionalGeneration.init(jax.random.PRNGKey(0), cfg0)

    rng = np.random.default_rng(8)
    audio = rng.standard_normal((2, 6, 104)).astype(np.float32)
    ids = rng.integers(3, cfg0.vocab_size, (2, 4)).astype(np.int32)
    l_ctc = float(m_ctc.loss(ids, ids, audio=audio))
    l0 = float(m0.loss(ids, ids, audio=audio))
    assert np.isfinite(l_ctc) and np.isfinite(l0)
    assert l_ctc != l0

    # gradient flows through both heads
    def f(params):
        m = AVHubertForConditionalGeneration(config=cfg_ctc, params=params)
        return m.loss(ids, ids, audio=audio)

    g = jax.grad(f)(m_ctc.params)
    assert np.isfinite(np.asarray(g["ctc_head"]["w"])).all()
    assert float(np.abs(np.asarray(g["ctc_head"]["w"])).sum()) > 0


def test_mouth_crop_box_reference_arithmetic():
    """Pin the crop geometry to the reference's exact integer arithmetic
    (feature_extraction_avhubert.py:99-113): truncation points, square side
    from the max extent, and out-of-bounds boxes left unclamped."""
    from reazonspeech_tpu.avsr.feature_extraction import mouth_crop_box

    # x-extent dominates; note 0.6-0.4 = 0.19999999999999996 in binary
    # floating point, so patch=19.99..., half=int(9.99...)=9 — the truncation
    # artifacts are part of the reference behavior and pinned here
    assert mouth_crop_box((0.4, 0.6), (0.45, 0.55), 100, 100) == (41, 59, 40, 58)
    # y-extent dominates (patch 30, half 15)
    assert mouth_crop_box((0.5, 0.55), (0.3, 0.6), 100, 100) == (30, 60, 37, 67)
    # truncation order: int(ymin*h) + int((extent/2)*h), NOT int of the sum
    assert mouth_crop_box((0.333, 0.666), (0.333, 0.666), 99, 99) == (32, 64, 32, 64)
    # a mouth at the frame corner: box touches 0 exactly, no clamping needed
    assert mouth_crop_box((0.0, 0.3), (0.0, 0.3), 100, 100) == (0, 30, 0, 30)
    # fully off-center small mouth: the box CAN go negative (numpy slicing
    # then yields an empty/garbled patch -> zero frame, like the reference)
    assert mouth_crop_box((0.0, 0.1), (0.0, 0.1), 100, 100) == (0, 10, 0, 10)


def test_mouth_roi_geometry_with_synthetic_landmarks(monkeypatch):
    """Drive _mouth_roi_mediapipe with a stubbed FaceMesh producing known
    landmarks; the extracted patch must equal the reference box resized."""
    import sys
    import types

    import numpy as np

    cv2 = pytest.importorskip("cv2")
    from reazonspeech_tpu.avsr import feature_extraction as fe

    class _LM:
        def __init__(self, x, y):
            self.x, self.y = x, y

    lms = [None] * 500
    # landmarks at ids (5, 411, 199, 187): a 20x10-px mouth on 100x100
    coords = {5: (0.5, 0.45), 411: (0.6, 0.5), 199: (0.5, 0.55), 187: (0.4, 0.5)}
    for idx, (x, y) in coords.items():
        lms[idx] = _LM(x, y)

    class _Mesh:
        def __init__(self, **kw):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def process(self, rgb):
            face = types.SimpleNamespace(landmark=lms)
            return types.SimpleNamespace(multi_face_landmarks=[face])

    fake_mp = types.SimpleNamespace(
        solutions=types.SimpleNamespace(
            face_mesh=types.SimpleNamespace(FaceMesh=_Mesh)
        )
    )

    frame = np.arange(100 * 100, dtype=np.float32).reshape(100, 100)
    out = fe._mouth_roi_mediapipe(frame[None], 88, fake_mp)

    # expected: box from the reference formula, resized to 88x88
    y0, y1, x0, x1 = fe.mouth_crop_box(
        [c[0] for c in coords.values()], [c[1] for c in coords.values()], 100, 100
    )
    assert (y0, y1, x0, x1) == (41, 59, 40, 58)
    want = cv2.resize(frame[y0:y1, x0:x1], (88, 88))
    np.testing.assert_allclose(out[0], want)
