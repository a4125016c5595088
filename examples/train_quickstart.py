"""Train a FastConformer-RNNT from a JSONL manifest (toy-scale quickstart).

The upstream package is inference-only; this framework also trains. The
flow: manifest (audio path + transcription per line, the corpus builder's
layout) -> static-shape batches -> warmup-cosine AdamW train steps with
Orbax checkpoints, resumable across runs:

    python examples/train_quickstart.py --manifest data.jsonl \
        --ckpt-dir /tmp/run1 --steps 200

Re-running with the same --ckpt-dir resumes from the newest checkpoint.
On a TPU pod slice, pass --data-parallel N --model-parallel M to shard the
step over a ('data','model') mesh (XLA inserts the gradient psums from the
sharding annotations alone), or --pipeline-parallel S to stage the encoder
block stack over a ('data','pipe') mesh under the GPipe schedule
(parallel/pipeline.py; combine with --data-parallel for dp x pp).
"""

import contextlib

import argparse

import jax

from reazonspeech_tpu.frontend.features import nemo_frontend_config
from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import default_ja_tokenizer, init_params
from reazonspeech_tpu.training.data import manifest_batches
from reazonspeech_tpu.training.trainer import Trainer, TrainerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--size", choices=("tiny", "xlarge"), default="tiny")
    ap.add_argument("--peak-lr", type=float, default=1e-3)
    ap.add_argument("--data-parallel", type=int, default=None)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--pipeline-parallel", type=int, default=None,
                    help="GPipe stages for the encoder block stack "
                         "(num_layers must divide by it)")
    args = ap.parse_args()

    if args.size == "tiny":
        enc_cfg = FastConformerConfig.tiny()
        rnnt_cfg = RNNTConfig.tiny(enc_dim=enc_cfg.d_model)
    else:
        enc_cfg = FastConformerConfig.xlarge(remat=True)
        rnnt_cfg = RNNTConfig(enc_dim=enc_cfg.d_model)
    fe_cfg = nemo_frontend_config()
    tokenizer = default_ja_tokenizer(rnnt_cfg.vocab_size)

    mesh = None
    pipeline = None
    run_ctx = contextlib.nullcontext()
    if args.pipeline_parallel:
        from reazonspeech_tpu.parallel.pipeline import (
            PipelineSpec,
            make_pipeline_mesh,
        )
        from reazonspeech_tpu.parallel.sequence import use_mesh

        pp_mesh = make_pipeline_mesh(
            n_pipe=args.pipeline_parallel,
            n_data=args.data_parallel or 1)
        pipeline = PipelineSpec(
            mesh=pp_mesh,
            data_axis="data" if args.data_parallel else None)
        run_ctx = use_mesh(pp_mesh)
    elif args.data_parallel:
        from reazonspeech_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.data_parallel, n_model=args.model_parallel)

    trainer = Trainer(
        fe_cfg, enc_cfg, rnnt_cfg,
        TrainerConfig(
            checkpoint_dir=args.ckpt_dir,
            save_every=max(args.steps // 10, 1),
            log_every=10,
            peak_lr=args.peak_lr,
            warmup_steps=max(args.steps // 20, 1),
            decay_steps=args.steps,
        ),
        mesh=mesh,
        pipeline=pipeline,
    )
    try:
        trainer.restore_latest(init_params(0, enc_cfg, rnnt_cfg))
        print(f"resumed from step {int(trainer.state.step)}")
    except FileNotFoundError:
        trainer.init(init_params(0, enc_cfg, rnnt_cfg))
        print("fresh run")

    batches = manifest_batches(
        args.manifest, tokenizer, args.batch_size, epochs=10_000
    )
    with run_ctx:
        history = trainer.fit(batches, max_steps=args.steps,
                              log_file=f"{args.ckpt_dir}/metrics.jsonl")
    trainer.save()
    if history:
        print(f"final: step {history[-1]['step']} loss {history[-1]['loss']:.3f}")


if __name__ == "__main__":
    main()
