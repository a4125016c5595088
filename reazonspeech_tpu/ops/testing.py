"""Test/off-TPU support: route the serving Pallas kernels through interpret
mode. Single source of truth for the kernel list — used by the parity gate
(tools/convert_and_gate.py) and the kernel test suites, so a new serving
kernel only needs registering here.
"""

import contextlib

__all__ = ["interpret_serving_kernels", "patch_interpret"]


def _targets():
    from . import beam_topk as bt
    from . import conformer_conv as cc
    from . import ln_dense as lnd
    from . import lstm_step as ls
    from . import relpos_attention as ra
    from . import zipformer_attention as za

    return [
        (bt, "topm_logsoftmax"),
        (bt, "joint_topm"),
        (ls, "lstm_cell_step"),
        (lnd, "ln_dense"),
        (lnd, "ln_dense_add"),
        (lnd, "add_ln"),
        (ra, "relpos_attention"),
        (ra, "relpos_attention_blockwise"),
        (ra, "relpos_attention_fused"),
        (ra, "relpos_attention_fused_packed"),
        (cc, "fused_conv_module"),
        (za, "shared_rel_attention"),
        (za, "shared_rel_attention_blockwise"),
    ]


def _wrap(f):
    def patched(*a, _f=f, **kw):
        kw.setdefault("interpret", True)
        return _f(*a, **kw)

    return patched


@contextlib.contextmanager
def interpret_serving_kernels(only_off_tpu=True):
    """Patch every serving kernel entry point to default interpret=True.

    The ``*_diff`` custom-VJP wrappers resolve these names at call time, so
    patching the module attributes reaches them too. With ``only_off_tpu``
    the patch is a no-op when a real TPU backend is active.
    """
    import jax

    if only_off_tpu and jax.default_backend() != "cpu":
        yield
        return
    saved = [(m, n, getattr(m, n)) for m, n in _targets()]
    try:
        for m, n, f in saved:
            setattr(m, n, _wrap(f))
        yield
    finally:
        for m, n, f in saved:
            setattr(m, n, f)


def patch_interpret(monkeypatch, names=None):
    """pytest variant: apply the same patches through a monkeypatch fixture
    (auto-undone). ``names`` optionally restricts to a subset."""
    for m, n in _targets():
        if names is not None and n not in names:
            continue
        monkeypatch.setattr(m, n, _wrap(getattr(m, n)))
