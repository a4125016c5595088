"""Tests of the evaluation harness with a fake recognizer (no network)."""

import json

import pytest

from reazonspeech_tpu.evaluation import (
    BaseEvaluator,
    calculate_cer,
    normalize,
)


class EchoEvaluator(BaseEvaluator):
    """Predicts a canned mapping — lets us pin aggregate CER exactly."""

    def __init__(self, mapping, **kwargs):
        super().__init__(**kwargs)
        self.mapping = mapping

    def _evaluate(self, example, **kwargs):
        return {"prediction": self.mapping[example["id"]]}

    def _evaluate_batch(self, batch, **kwargs):
        return {"predictions": [self.mapping[i] for i in batch["id"]]}


def dataset_dict():
    return {
        "id": [0, 1, 2],
        "text": ["こんにちは", "ありがとう", "さようなら"],
    }


def test_evaluate_from_dict(capsys):
    ev = EchoEvaluator({0: "こんにちは", 1: "ありがとう", 2: "さようなら"})
    out = ev.evaluate(dataset=dataset_dict())
    assert out["prediction"] == ["こんにちは", "ありがとう", "さようなら"]
    assert sum(out["distance"]) == 0
    assert "CER: 0.00%" in capsys.readouterr().out


def test_evaluate_counts_errors(capsys):
    ev = EchoEvaluator({0: "こんにちは", 1: "ありがとお", 2: "さようなら"})
    out = ev.evaluate(dataset=dataset_dict())
    assert sum(out["distance"]) == 1
    # 1 error / 15 chars
    assert "CER: 6.67%" in capsys.readouterr().out


def test_evaluate_batched(capsys):
    ev = EchoEvaluator(
        {0: "こんにちは", 1: "ありがとう", 2: "さようなら"}, batch_size=2
    )
    out = ev.evaluate(dataset=dataset_dict())
    assert sum(out["distance"]) == 0


def test_evaluate_jsonl_roundtrip(tmp_path, capsys):
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i, t in enumerate(["こんにちは", "ありがとう"]):
            f.write(json.dumps({"id": i, "text": t}, ensure_ascii=False) + "\n")
    out_file = tmp_path / "result.jsonl"
    ev = EchoEvaluator({0: "こんにちは", 1: "ありがとう"}, output_file=str(out_file))
    ev.evaluate(dataset=str(p))
    lines = [json.loads(x) for x in out_file.read_text().strip().split("\n")]
    assert len(lines) == 2
    assert lines[0]["prediction"] == "こんにちは"
    assert lines[0]["distance"] == 0


def test_evaluate_requires_dataset():
    ev = EchoEvaluator({})
    with pytest.raises(ValueError, match="No dataset"):
        ev.evaluate()


def test_normalization_applied_in_cer():
    # 25 -> 二十五 on both sides; punctuation stripped
    r = calculate_cer("25日です。", "２５日です")
    assert r["distance"] == 0
    assert normalize("２５日です。") == "二十五日です"


def test_evaluate_multiprocess(capsys):
    """num_proc=2 forks datasets.map workers — the evaluator must pickle and
    the per-process results must merge (the reference's multi-GPU pattern,
    pkg/evaluation/src/base.py:194-215)."""
    ev = EchoEvaluator(
        {i: t for i, t in enumerate(["あ", "い", "う", "え"])}, num_proc=2
    )
    out = ev.evaluate(dataset={"id": [0, 1, 2, 3], "text": ["あ", "い", "う", "お"]})
    assert sum(out["distance"]) == 1
    assert "CER: 25.00%" in capsys.readouterr().out
