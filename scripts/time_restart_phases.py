"""Phase breakdown of one production Lanczos restart on the TPU.

Replicates lanczos_hermitian_realpair's restart loop with a force() +
perf_counter around every phase.  Each force adds one ~30 ms tunnel sync —
acceptable to locate a ~4 s/restart mystery.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (16, 16, 16, 32)
NKR = 48
NEV = 16

_SUM = jax.jit(lambda a: jnp.sum(a * a))


def force(x):
    return float(_SUM(x))


def main():
    from mugiq_tpu.lattice import LatticeGeometry
    from mugiq_tpu.rc.host import gauge_rc
    import mugiq_tpu.pallas.dslash_kernel as dk
    from mugiq_tpu.pallas.dirac_kernel import WilsonDiracKernel
    from mugiq_tpu.planar.lanczos import _make_ops, _make_cycle, _norm

    print(f"backend: {jax.devices()}", flush=True)
    geom = LatticeGeometry(DIMS)
    U_rc = gauge_rc(geom, "random", seed=1)
    U_pl = jnp.transpose(U_rc, (7, 0, 5, 6, 1, 2, 3, 4))
    U_k = dk.to_kernel_gauge(U_pl)
    op = WilsonDiracKernel(U_k=U_k, kappa=0.12, Y=DIMS[1])

    m = NKR
    ax = 1
    rdtype = jnp.float32
    k = NEV + (m - NEV) // 2
    _, _, rotate = _make_ops(ax)
    cycle = _make_cycle(op.MdagM, m, rdtype, ax)
    rotate_jit = jax.jit(rotate)

    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal(op.field_shape).astype(np.float32))
    v0 = v0 / _norm(v0)
    V = jnp.zeros((m + 1,) + op.field_shape, rdtype).at[0].set(v0)
    Tmat = jnp.zeros((m, m, 2), rdtype)

    # warm all compiles
    V, Tmat, beta_m = cycle(V, Tmat, 0)
    force(beta_m[None])
    Qs = np.ones((m + 1, k), np.complex128)
    Vk = rotate_jit(V, jnp.asarray(Qs.real, rdtype), jnp.asarray(Qs.imag, rdtype))
    force(Vk[0])
    V2 = V.at[:k].set(Vk)
    force(V2[0])
    del V2

    j0 = 0
    for restart in range(5):
        t = {}
        t0 = time.perf_counter()
        V, Tmat, beta_m = cycle(V, Tmat, j0)
        force(beta_m[None]); t["cycle"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        T_host = np.asarray(Tmat[..., 0]) + 1j * np.asarray(Tmat[..., 1])
        t["T_read"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        theta, q = np.linalg.eigh((T_host + T_host.conj().T) / 2)
        t["eigh"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        beta = float(beta_m)
        t["beta_read"] = time.perf_counter() - t0

        sel = np.arange(k)
        t0 = time.perf_counter()
        Qs = np.vstack([q[:, sel], np.zeros((1, k), dtype=q.dtype)])
        Vk = rotate_jit(V, jnp.asarray(Qs.real, rdtype),
                        jnp.asarray(Qs.imag, rdtype))
        force(Vk[0]); t["rotate"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        V = V.at[:k].set(Vk)
        force(V[0]); t["V_setk"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        V = V.at[k].set(V[m])
        force(V[0]); t["V_setres"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        Tn = np.zeros((m, m, 2), np.float32)
        Tn[np.arange(k), np.arange(k), 0] = theta[sel]
        Tmat = jnp.asarray(Tn)
        force(Tmat); t["T_upload"] = time.perf_counter() - t0

        j0 = k
        total = sum(t.values())
        print(f"restart {restart}: total {total:.3f} s | " +
              " ".join(f"{kk}={vv:.3f}" for kk, vv in t.items()), flush=True)


if __name__ == "__main__":
    main()
