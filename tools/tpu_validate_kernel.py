import numpy as np, jax, jax.numpy as jnp
from reazonspeech_tpu.ops.relpos_attention import relpos_attention
from reazonspeech_tpu.models.fastconformer import _rel_shift

def check(b,h,t,dh,block_q,tag):
    rng = np.random.default_rng(42)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    qu,qv,k,v,pos = mk(b,h,t,dh),mk(b,h,t,dh),mk(b,h,t,dh),mk(b,h,t,dh),mk(2*t-1,h,dh)
    lens = jnp.array([t] + [max(t//2,1)]*(b-1))
    got = np.asarray(relpos_attention(qu,qv,k,v,pos,lens,block_q=block_q))
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, k)
    bd = _rel_shift(jnp.einsum("bhtd,hld->bhtl", qv, jnp.transpose(pos,(1,0,2))))
    sc = (ac+bd)/np.sqrt(dh)
    mask = jnp.arange(t)[None,:] < lens[:,None]
    sc = jnp.where(mask[:,None,None,:], sc, -1e30)
    want = np.asarray(jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(sc,-1), v))
    err = np.abs(got-want)
    # compare only valid query rows
    m = np.asarray(mask)
    err = err * m[:,None,:,None]
    print(f"{tag}: max err {err.max():.2e}", flush=True)

check(2, 8, 376, 128, 256, "nemo shape (dh=128, T=376)")
check(2, 8, 501, 64, 256, "espnet shape (dh=64, T=501)")
check(2, 4, 100, 128, 256, "small T<block (dh=128, T=100)")
