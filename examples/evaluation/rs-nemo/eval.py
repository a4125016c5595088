"""CER evaluation of the nemo-v2 flavor on `reazon-research/reazonspeech`.

Pattern parity with the reference example (pkg/evaluation/examples/rs-nemo/
eval.py): lazy per-process model load, 10 rows of the "tiny" config, CER
printed by the harness. On TPU, device placement is JAX's — one process per
chip/host (a TPU chip grant is exclusive, unlike CUDA device indices), so
num_proc>1 is for CPU-bound decode or multi-host setups.
"""

import warnings

from datasets import Audio, load_dataset

from reazonspeech_tpu.evaluation import (
    BaseEvaluator,
    EvaluationResult,
    EvaluationResultBatch,
)
from reazonspeech_tpu.nemo.asr import (
    TranscribeConfig,
    audio_from_path,
    load_model,
    transcribe,
)
from reazonspeech_tpu.nemo.asr.transcribe import transcribe_batch

warnings.filterwarnings("ignore")


class RSNemoEvaluator(BaseEvaluator):
    def __init__(self, mesh_data: int | None = None, **kwargs):
        super().__init__(**kwargs)
        self.config = TranscribeConfig(verbose=False)
        self.mesh_data = mesh_data

    def _make_model(self):
        model = load_model()
        if self.mesh_data:
            # one evaluation process spans the slice: the decode batch is
            # sharded over the mesh data axis (single-process replacement
            # for the reference's spawn-per-GPU evaluation loop)
            from reazonspeech_tpu.evaluation import mesh_model

            model = mesh_model(model, self.mesh_data)
        return model

    def _evaluate(
        self, example, rank: int | None = None, num_gpus: int | None = None, **kwargs
    ) -> EvaluationResult:
        if self.model is None:
            print(f"Loading model (rank {rank or 0})")
            self.model = self._make_model()
        ret = transcribe(self.model, audio_from_path(example["audio"]["path"]), self.config)
        return {"prediction": ret.text}

    def _evaluate_batch(self, batch, **kwargs) -> EvaluationResultBatch:
        if self.model is None:
            self.model = self._make_model()
        audios = [audio_from_path(a["path"]) for a in batch["audio"]]
        rets = transcribe_batch(self.model, audios, self.config)
        return {"predictions": [r.text for r in rets]}


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_gpus", type=int, default=None)
    parser.add_argument("--num_proc", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--output_file", type=str, default=None)
    parser.add_argument(
        "--local-fixture",
        type=str,
        default=None,
        help="directory of a local 10-row dataset (built on first use) "
        "instead of the hub dataset — offline/CI runs",
    )
    parser.add_argument(
        "--mesh-data",
        type=int,
        default=None,
        help="shard the decode batch over this many devices (one process "
        "spans the TPU slice; use with a batch_size, not num_proc)",
    )
    args = parser.parse_args()

    evaluator = RSNemoEvaluator(
        output_file=args.output_file, mesh_data=args.mesh_data)
    if args.local_fixture:
        import os
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from local_fixture import load_fixture

        dataset = load_fixture(args.local_fixture)
    else:
        dataset = load_dataset("reazon-research/reazonspeech", "tiny", split="train")
        dataset = dataset.cast_column("audio", Audio(decode=False)).select(range(10))
    batch_size = args.batch_size
    if batch_size is None and args.mesh_data:
        batch_size = 2 * args.mesh_data  # mesh decode wants real batches
    evaluated = evaluator.evaluate(
        dataset=dataset,
        text_column="transcription",
        batch_size=batch_size,
        num_gpus=args.num_gpus,
        num_proc=args.num_proc,
    )