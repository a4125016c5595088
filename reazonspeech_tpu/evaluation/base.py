"""Base evaluator for speech-recognition evaluation over HF datasets.

Contract parity with the reference (pkg/evaluation/src/base.py:1-303): the
same constructor/evaluate() signatures, polymorphic dataset loading, map()-
based process parallelism with spawn for multi-accelerator runs, CER
aggregation printed as ``CER: x.xx%``, and optional JSONL dump. The GPU
pinning story becomes device pinning over jax.devices() in subclasses.
"""

import os
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Callable, Optional, TypedDict

from .utils import CERResult, calculate_cer

__all__ = ["BaseEvaluator", "EvaluationResult", "EvaluationResultBatch"]


class EvaluationResult(TypedDict):
    """Result of evaluating a single example."""

    prediction: str


class EvaluationResultBatch(TypedDict):
    """Result of evaluating a batch of examples."""

    predictions: list[str]


class BaseEvaluator(ABC):
    """Abstract base class for speech recognition evaluators.

    Subclasses implement ``_evaluate`` (one example) and ``_evaluate_batch``
    (a batch); ``evaluate()`` drives them over a dataset with optional process
    parallelism and reports aggregate CER.
    """

    def __init__(
        self,
        model=None,
        processor=None,
        dataset=None,
        output_file: Optional[os.PathLike] = None,
        batch_size: Optional[int] = None,
        num_proc: Optional[int] = None,
        num_gpus: Optional[int] = None,
        text_column: str = "text",
    ):
        self.model = model
        self.processor = processor
        self.output_file = output_file
        self.batch_size = batch_size
        self.num_proc = num_proc
        self.num_gpus = num_gpus
        self.text_column = text_column
        self.dataset = self._load_dataset(dataset) if dataset is not None else None

    def _load_dataset(self, dataset):
        """Load a dataset from a Dataset, dict, generator callable, or path
        (file .jsonl/.json/... or directory)."""
        from datasets import Dataset, load_dataset

        if isinstance(dataset, Dataset):
            return dataset
        elif isinstance(dataset, dict):
            return Dataset.from_dict(dataset)
        elif isinstance(dataset, Callable):
            return Dataset.from_generator(dataset)
        elif isinstance(dataset, (os.PathLike, str)):
            if not isinstance(dataset, Path):
                dataset = Path(dataset)
            if dataset.is_file():
                ext = dataset.suffix
                if ext == ".jsonl":
                    ext = ".json"
                ext = ext.removeprefix(".")
                return load_dataset(
                    ext, data_files={"train": dataset.as_posix()}, num_proc=self.num_proc
                )["train"]
            elif dataset.is_dir():
                return load_dataset(
                    dataset.as_posix(),
                    split="train",
                    trust_remote_code=True,
                    num_proc=self.num_proc,
                )
            else:
                raise ValueError(f"Invalid dataset path: {dataset}")
        else:
            raise ValueError(f"Invalid dataset type: {type(dataset)}")

    def _calculate_cer(self, example: dict[str, Any], text_column: str) -> CERResult:
        return calculate_cer(example[text_column], example["prediction"])

    def evaluate(
        self,
        dataset=None,
        batch_size: Optional[int] = None,
        num_proc: Optional[int] = None,
        num_gpus: Optional[int] = None,
        text_column: Optional[str] = None,
        output_file: Optional[os.PathLike] = None,
    ):
        """Run the model over the dataset, add prediction/distance/length
        columns, print aggregate CER, optionally dump JSONL.

        Returns the evaluated Dataset.
        """
        dataset = self._load_dataset(dataset) if dataset is not None else self.dataset
        batch_size = batch_size or self.batch_size
        num_proc = num_proc or self.num_proc
        num_gpus = num_gpus or self.num_gpus
        text_column = text_column or self.text_column
        output_file = output_file or self.output_file

        if dataset is None:
            raise ValueError("No dataset provided and self.dataset is None.")

        use_gpus = num_gpus is not None and num_proc is not None and num_gpus > 1
        if use_gpus:
            from multiprocess import set_start_method

            set_start_method("spawn", force=True)

        if batch_size is None:
            evaluated = dataset.map(
                self._evaluate,
                with_rank=use_gpus,
                num_proc=num_proc,
                fn_kwargs={"num_gpus": num_gpus, "num_proc": num_proc},
            )
        else:
            # note: the reference forgets batched=True here (its batch path
            # feeds single rows to _evaluate_batch); fixed, with the
            # 'predictions' list mapped onto the per-row 'prediction' column.
            def batch_fn(batch, *args, **kwargs):
                out = self._evaluate_batch(batch, *args, **kwargs)
                return {"prediction": out["predictions"]}

            evaluated = dataset.map(
                batch_fn,
                batched=True,
                batch_size=batch_size,
                with_rank=use_gpus,
                num_proc=num_proc,
                fn_kwargs={"num_gpus": num_gpus, "num_proc": num_proc},
            )

        if use_gpus:
            from multiprocess import set_start_method

            set_start_method("forkserver", force=True)

        evaluated = evaluated.map(
            self._calculate_cer,
            num_proc=num_proc,
            fn_kwargs={"text_column": text_column},
        )

        dist = sum(evaluated["distance"])
        length = sum(evaluated["length"])
        print(f"CER: {dist / length * 100:.2f}%")

        if output_file is not None:
            evaluated.to_json(output_file, num_proc=num_proc, force_ascii=False)

        return evaluated

    def calculate_cer(self, dataset, text_column=None, num_proc=None) -> float:
        """Aggregate CER over a dataset that already has predictions."""
        text_column = text_column or self.text_column
        num_proc = num_proc or self.num_proc
        evaluated = dataset.map(
            self._calculate_cer, num_proc=num_proc, fn_kwargs={"text_column": text_column}
        )
        dist = sum(evaluated["distance"])
        length = sum(evaluated["length"])
        return dist / length

    @abstractmethod
    def _evaluate(self, example: dict[str, Any], *args, **kwargs) -> EvaluationResult:
        """Evaluate a single example; return {'prediction': text}."""
        raise NotImplementedError("Subclasses must implement _evaluate method")

    @abstractmethod
    def _evaluate_batch(
        self, batch: dict[str, Any], *args, **kwargs
    ) -> EvaluationResultBatch:
        """Evaluate a batch; return {'predictions': [text, ...]}."""
        raise NotImplementedError("Subclasses must implement _evaluate_batch method")
