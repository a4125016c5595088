import struct

import pytest

from reazonspeech_tpu.core.tokenizer import (
    CharTokenizer,
    SentencePieceTokenizer,
    VocabTokenizer,
)


def encode_varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def sp_piece(piece, score=0.0, ptype=None):
    body = b"\x0a" + encode_varint(len(piece.encode())) + piece.encode()
    body += b"\x15" + struct.pack("<f", score)
    if ptype is not None:
        body += b"\x18" + encode_varint(ptype)
    return b"\x0a" + encode_varint(len(body)) + body


def build_sp_model(tmp_path):
    """Hand-assemble a minimal SentencePiece .model protobuf."""
    data = b""
    data += sp_piece("<unk>", 0.0, 2)
    data += sp_piece("<s>", 0.0, 3)
    data += sp_piece("</s>", 0.0, 3)
    data += sp_piece("▁こん", -1.0)
    data += sp_piece("にちは", -2.0)
    data += sp_piece("▁", -3.0)
    data += sp_piece("世界", -4.0)
    data += sp_piece("<0xE3>", 0.0, 6)
    data += sp_piece("<0x81>", 0.0, 6)
    data += sp_piece("<0x82>", 0.0, 6)
    # trailing unrelated field (trainer_spec, field 2) must be skipped
    data += b"\x12" + encode_varint(3) + b"abc"
    p = tmp_path / "test.model"
    p.write_bytes(data)
    return p


def test_sentencepiece_parse_and_decode(tmp_path):
    tok = SentencePieceTokenizer.from_model_file(build_sp_model(tmp_path))
    assert tok.vocab_size == 10
    assert tok.pieces[3] == "▁こん"
    assert tok.ids_to_text([3, 4]) == "こんにちは"
    assert tok.ids_to_text([3, 4, 5, 6]) == "こんにちは 世界"
    # control tokens skipped
    assert tok.ids_to_text([1, 3, 4, 2]) == "こんにちは"
    # single whitespace meta token decodes to empty (the reference trims
    # these, pkg/nemo-asr/src/decode.py:51-53)
    assert tok.ids_to_text([5]) == ""
    # byte pieces reassemble into utf-8 (E3 81 82 = あ)
    assert tok.ids_to_text([7, 8, 9]) == "あ"
    assert tok.ids_to_tokens([3, 6]) == ["▁こん", "世界"]


def test_vocab_tokenizer(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("<blk> 0\n<sos/eos> 1\n<unk> 2\nこ 3\nん 4\n▁ 5\n", encoding="utf-8")
    tok = VocabTokenizer.from_tokens_file(p)
    assert tok.vocab_size == 6
    assert tok.ids_to_text([3, 4]) == "こん"
    assert tok.ids_to_text([0, 3, 1, 4]) == "こん"


def test_char_tokenizer():
    tok = CharTokenizer(["a", "b", "c"])
    assert tok.text_to_ids("abc") == [0, 1, 2]
    assert tok.ids_to_text([2, 1]) == "cb"
