"""Training driver: schedules, checkpoint/resume, logging, mesh sharding.

The reference ships no trainer; this completes the framework's training
story around training/train_step.py (SURVEY.md §5 "checkpoint / resume"):
step-numbered Orbax checkpoints of the FULL training state (params +
optimizer state + step), resume-from-latest, warmup-cosine AdamW with
gradient clipping, JSONL metric logging, and optional ('data','model') mesh
sharding (parallel.mesh rules — the same path dryrun_multichip exercises).
"""

import json
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

import jax
import optax

from .train_step import TrainState, make_train_step

__all__ = ["TrainerConfig", "Trainer"]


@dataclass(frozen=True)
class TrainerConfig:
    checkpoint_dir: Optional[str] = None
    save_every: int = 1000
    log_every: int = 50
    keep_checkpoints: int = 3
    # warmup-cosine schedule (NeMo/icefall recipes' shape)
    peak_lr: float = 1e-3
    warmup_steps: int = 1000
    decay_steps: int = 100_000
    end_lr_scale: float = 0.05
    weight_decay: float = 0.01
    grad_clip: float = 5.0
    ctc_weight: float = 0.0
    # "full" = materialized-joint rnnt_loss; "pruned" = icefall-style
    # simple+pruned objective (params need a "simple_joint" entry)
    loss: str = "full"
    s_range: int = 5
    simple_scale: float = 0.5


def _schedule(cfg: TrainerConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.peak_lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.decay_steps,
        end_value=cfg.peak_lr * cfg.end_lr_scale,
    )


class Trainer:
    """Stateful wrapper around the pure train step.

    >>> tr = Trainer(fe_cfg, enc_cfg, rnnt_cfg, TrainerConfig(ckpt_dir))
    >>> tr.init(params)            # or tr.restore_latest(params_template)
    >>> tr.fit(batch_iter, max_steps=10_000)
    """

    def __init__(self, fe_cfg, enc_cfg, rnnt_cfg, cfg: TrainerConfig = TrainerConfig(),
                 mesh=None, pipeline=None):
        """``pipeline``: optional ``parallel.pipeline.PipelineSpec`` — the
        encoder fwd+bwd runs under the GPipe schedule over the spec's mesh
        (pass the same mesh as ``mesh`` for batch/param placement)."""
        self.cfg = cfg
        self.mesh = mesh
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(_schedule(cfg), weight_decay=cfg.weight_decay),
        )
        self._init_state, step_fn = make_train_step(
            fe_cfg, enc_cfg, rnnt_cfg, optimizer=self.optimizer,
            ctc_weight=cfg.ctc_weight, loss=cfg.loss, s_range=cfg.s_range,
            simple_scale=cfg.simple_scale, pipeline=pipeline,
        )
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            self._shard_batch = lambda b: shard_batch(b, mesh)
        else:
            self._shard_batch = lambda b: b
        self._step_fn = jax.jit(step_fn)
        self.state: Optional[TrainState] = None
        self.history: list = []

    # -- state ------------------------------------------------------------

    def init(self, params):
        if self.mesh is not None:
            from ..parallel.mesh import shard_params

            params = shard_params(params, self.mesh)
        self.state = self._init_state(params)
        return self

    def _ckpt_path(self, step):
        return os.path.join(self.cfg.checkpoint_dir, f"step_{step:08d}")

    def save(self):
        """Write the FULL training state (params + opt state + step)."""
        if self.cfg.checkpoint_dir is None:
            raise ValueError("TrainerConfig.checkpoint_dir is not set")
        import orbax.checkpoint as ocp

        step = int(self.state.step)
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        path = os.path.abspath(self._ckpt_path(step))
        tree = {"params": self.state.params, "opt_state": self.state.opt_state,
                "step": self.state.step}
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
        # retention: keep the newest N
        steps = self.list_checkpoints(self.cfg.checkpoint_dir)
        for s in steps[: -self.cfg.keep_checkpoints]:
            import shutil

            shutil.rmtree(self._ckpt_path(s), ignore_errors=True)
        return path

    @staticmethod
    def list_checkpoints(checkpoint_dir):
        """Sorted step numbers of checkpoints under ``checkpoint_dir``."""
        if not os.path.isdir(checkpoint_dir):
            return []
        out = []
        for name in os.listdir(checkpoint_dir):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def restore_latest(self, params_template):
        """Resume from the newest checkpoint; ``params_template`` is a tree
        of like-shaped arrays (e.g. a fresh init) fixing the structure.
        Returns self; raises FileNotFoundError with remediation if none."""
        steps = self.list_checkpoints(self.cfg.checkpoint_dir or "")
        if not steps:
            raise FileNotFoundError(
                f"no step_* checkpoints under {self.cfg.checkpoint_dir}; "
                "call init(params) for a fresh run"
            )
        import orbax.checkpoint as ocp

        self.init(params_template)  # builds opt-state template (and shards)
        template = {"params": self.state.params,
                    "opt_state": self.state.opt_state, "step": self.state.step}
        path = os.path.abspath(self._ckpt_path(steps[-1]))
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(path, template)
        self.state = TrainState(
            params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
        )
        return self

    # -- loop -------------------------------------------------------------

    def fit(self, batches, max_steps, log_file=None):
        """Run up to ``max_steps`` optimizer steps over ``batches`` (an
        iterable of dicts: waveform/lengths/labels/label_lengths). Returns
        the metric history ([{step, loss, grad_norm, seconds}])."""
        if self.state is None:
            raise RuntimeError("call init(params) or restore_latest() first")
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        logf = open(log_file, "a") if log_file else None
        t0 = time.perf_counter()
        try:
            for batch in batches:
                if int(self.state.step) >= max_steps:
                    break
                batch = self._shard_batch(batch)
                self.state, metrics = self._step_fn(self.state, batch)
                step = int(self.state.step)
                if step % self.cfg.log_every == 0 or step == 1:
                    rec = {
                        "step": step,
                        "loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "seconds": round(time.perf_counter() - t0, 3),
                    }
                    self.history.append(rec)
                    if logf:
                        logf.write(json.dumps(rec) + "\n")
                        logf.flush()
                if self.cfg.checkpoint_dir and step % self.cfg.save_every == 0:
                    self.save()
        finally:
            if logf:
                logf.close()
        return self.history
