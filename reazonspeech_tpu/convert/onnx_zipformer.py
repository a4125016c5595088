"""Convert sherpa-onnx zipformer transducer graphs into native param trees.

The reference's k2 models ship exclusively as ONNX graphs
(pkg/k2-asr/src/huggingface.py:40-59: encoder/decoder/joiner ×
fp32/int8/int8-fp32). The decoder (stateless predictor: embedding + 2-token
context conv + relu) and joiner (3 linears) are small fixed-topology graphs,
converted here by SHAPE-driven tensor identification — robust to exporter
naming differences:

- decoder: the [V, D] tensor is the embedding; the [D, D, ctx] (or transposed)
  tensor is the context conv, folded into our concat-linear layout.
- joiner: [D_enc, J], [D_dec, J], [J, V] linears matched by dimensions.

int8 graphs (DynamicQuantizeLinear exports) carry int8 initializers next to
their scales; both are read (convert.onnx_reader) and dequantized.

The traced encoder graph's weights are heavily fused by the exporter; encoder
conversion targets the icefall .pt checkpoint instead (published alongside
the ONNX files) — see convert_zipformer_torch below for the mapping entry
point.
"""

import numpy as np

from ..models.rnnt import RNNTConfig
from .onnx_reader import read_onnx_initializers
from .store import save_param_tree

__all__ = ["convert_decoder_joiner", "convert_zipformer_torch"]


def _dequant_pairs(tensors):
    """Join int8 tensors with their per-tensor/channel scales by name stem."""
    out = {}
    for name, arr in tensors.items():
        if arr.dtype == np.int8:
            for suffix in ("_scale", ".scale", "_quantized_scale"):
                cand = name.replace("_quantized", "") + suffix
                if cand in tensors:
                    out[name] = arr.astype(np.float32) * tensors[cand]
                    break
            else:
                out[name] = arr  # keep raw int8; caller may dequant later
        elif arr.dtype in (np.float32, np.float16):
            out[name] = arr.astype(np.float32)
    return out


def convert_decoder_joiner(decoder_onnx, joiner_onnx, rnnt_cfg: RNNTConfig):
    """Build {predictor, joint} subtrees from sherpa decoder/joiner graphs.

    Returns (predictor_params, joint_params).
    """
    dec = _dequant_pairs(read_onnx_initializers(decoder_onnx))
    joi = _dequant_pairs(read_onnx_initializers(joiner_onnx))
    v, d = rnnt_cfg.vocab_size, rnnt_cfg.pred_hidden
    ctx = rnnt_cfg.context_size

    embed = None
    conv = None
    for name, arr in dec.items():
        if arr.ndim == 2 and arr.shape == (v, d):
            embed = arr
        elif arr.ndim == 3 and sorted(arr.shape) == sorted((d, d, ctx)):
            conv = arr
    if embed is None or conv is None:
        raise ValueError(
            f"decoder graph tensors not identified (need embed [{v},{d}] and "
            f"conv [{d},{d},{ctx}]); found shapes: "
            f"{[a.shape for a in dec.values()]}"
        )
    # torch Conv1d weight [out, in, K] applied over the ctx axis is exactly a
    # linear over the concatenated per-step embeddings: w_lin[(k*in)+i, out]
    if conv.shape == (d, d, ctx):
        w = np.transpose(conv, (2, 1, 0)).reshape(ctx * d, d)
    else:
        raise ValueError(f"unexpected decoder conv layout: {conv.shape}")
    bias = next(
        (a for a in dec.values() if a.ndim == 1 and a.shape == (d,)),
        np.zeros(d, np.float32),
    )
    predictor = {
        "embed": {"table": embed},
        "ctx_proj": {"w": w, "b": bias},
    }

    j = rnnt_cfg.joint_hidden
    enc_w = pred_w = out_w = None
    enc_b = pred_b = out_b = None
    for name, arr in joi.items():
        if arr.ndim != 2:
            continue
        shape = arr.shape
        if shape == (j, rnnt_cfg.enc_dim) or shape == (rnnt_cfg.enc_dim, j):
            enc_w = arr.T if shape[0] == j else arr
        elif shape == (j, d) or (shape == (d, j) and d != j):
            pred_w = arr.T if shape[0] == j else arr
        elif shape == (rnnt_cfg.num_classes, j) or shape == (j, rnnt_cfg.num_classes):
            out_w = arr.T if shape[0] == rnnt_cfg.num_classes else arr
    for name, arr in joi.items():
        if arr.ndim == 1:
            if arr.shape == (j,) and enc_b is None:
                enc_b = arr
            elif arr.shape == (j,) and pred_b is None:
                pred_b = arr
            elif arr.shape == (rnnt_cfg.num_classes,):
                out_b = arr
    if enc_w is None or out_w is None:
        raise ValueError(
            f"joiner tensors not identified; found shapes: "
            f"{[a.shape for a in joi.values()]}"
        )
    if pred_w is None and d == j:
        raise ValueError(
            "joiner enc/pred projections are shape-ambiguous (enc_dim == "
            "pred_hidden == joint_hidden); convert from the icefall .pt instead"
        )
    joint = {
        "enc": {"w": enc_w, "b": enc_b if enc_b is not None else np.zeros(j, np.float32)},
        "pred": {"w": pred_w, "b": pred_b if pred_b is not None else np.zeros(j, np.float32)},
        "out": {"w": out_w, "b": out_b if out_b is not None else np.zeros(rnnt_cfg.num_classes, np.float32)},
    }
    return predictor, joint


def convert_zipformer_torch(pt_path, out_path, enc_cfg=None, rnnt_cfg=None):
    """Entry point for icefall .pt zipformer checkpoints (the encoder's
    canonical source; published next to the ONNX exports) — delegates to
    convert.icefall_zipformer."""
    from .icefall_zipformer import convert_icefall_checkpoint

    return convert_icefall_checkpoint(pt_path, out_path, enc_cfg, rnnt_cfg)
