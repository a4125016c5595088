"""CER evaluation of an external Whisper baseline (HF transformers).

Pattern parity with pkg/evaluation/examples/whisper/eval.py, which pins the
full decode parameter set (temperature ladder, beam 5). The openai-whisper
package is replaced by the HF transformers pipeline (baked into this image);
decode params map onto generate kwargs where supported.
"""

import warnings

from datasets import Audio, load_dataset

from reazonspeech_tpu.evaluation import (
    BaseEvaluator,
    EvaluationResult,
    EvaluationResultBatch,
)

warnings.filterwarnings("ignore")

temperature = (0.0, 0.2, 0.4, 0.6000000000000001, 0.8, 1.0)
generate_kwargs = {
    "language": "ja",
    "task": "transcribe",
    "num_beams": 5,
    "temperature": temperature,
    "compression_ratio_threshold": 2.4,
    "logprob_threshold": -1.0,
    "no_speech_threshold": 0.6,
    "condition_on_prev_tokens": True,
}


class WhisperEvaluator(BaseEvaluator):
    def __init__(self, model_name: str = "openai/whisper-base", **kwargs):
        super().__init__(**kwargs)
        self.model_name = model_name

    def _evaluate(
        self, example, rank: int | None = None, num_gpus: int | None = None, **kwargs
    ) -> EvaluationResult:
        if self.model is None:
            from transformers import pipeline

            print(f"Loading {self.model_name} (rank {rank or 0})")
            self.model = pipeline(
                "automatic-speech-recognition", model=self.model_name
            )
        ret = self.model(
            example["audio"]["path"], generate_kwargs=generate_kwargs
        )
        return {"prediction": ret["text"]}

    def _evaluate_batch(self, batch, **kwargs) -> EvaluationResultBatch:
        raise NotImplementedError("Batch evaluation is not supported")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="openai/whisper-tiny")
    parser.add_argument("--num_gpus", type=int, default=None)
    parser.add_argument("--num_proc", type=int, default=None)
    parser.add_argument("--output_file", type=str, default=None)
    args = parser.parse_args()

    evaluator = WhisperEvaluator(model_name=args.model, output_file=args.output_file)
    dataset = load_dataset("reazon-research/reazonspeech", "tiny", split="train")
    dataset = dataset.cast_column("audio", Audio(decode=False)).select(range(10))
    evaluated = evaluator.evaluate(
        dataset=dataset,
        text_column="transcription",
        num_gpus=args.num_gpus,
        num_proc=args.num_proc,
    )
