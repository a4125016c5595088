"""Single-process mesh evaluation: one evaluator spans a TPU slice.

The reference's only multi-accelerator story is process-level data
parallelism — N spawned workers, one GPU each, coordinated by datasets.map
(pkg/evaluation/src/base.py:194-215). On TPU the idiomatic shape is the
opposite: ONE process holds the whole slice as a `jax.sharding.Mesh` and
the evaluation batch is sharded over the mesh's data axis, so the weights
load once, the host pipeline (audio decode, CER scoring) stays in-process,
and scaling is a `--mesh-data N` flag instead of a process pool.

:func:`mesh_model` wraps a flavor container in
:class:`~reazonspeech_tpu.parallel.serving.DataParallelDecoder`, which
satisfies the container contract (``decode_batch``/``decode_single`` plus
attribute delegation), so the public per-flavor ``transcribe`` /
``transcribe_batch`` entry points run over the slice unchanged — see
examples/evaluation/rs-{nemo,k2}/eval.py ``--mesh-data``.
"""

from __future__ import annotations

__all__ = ["mesh_model"]


def mesh_model(model, n_data: int, devices=None):
    """Wrap a flavor container so its decode spans ``n_data`` devices.

    Args:
      model: a nemo/espnet/k2 container exposing ``decode_batch_fn()``
      n_data: mesh data-axis size (number of devices the batch shards over)
      devices: optional explicit device list (defaults to
        ``jax.devices()[:n_data]``)

    Returns a drop-in replacement for ``model`` whose ``decode_batch`` /
    ``decode_single`` run data-parallel over the mesh; every other
    attribute (tokenizer, configs) is delegated to the wrapped container.
    """
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.serving import DataParallelDecoder

    if devices is None:
        devices = jax.devices()[:n_data]
    if len(devices) < n_data:
        raise ValueError(
            f"mesh evaluation needs {n_data} devices, have {len(devices)}; "
            "for CPU/emulated runs set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_data}")
    mesh = make_mesh(n_data=n_data, devices=devices)
    return DataParallelDecoder(model, mesh)
