"""Probe: which MG-setup formulations compile/run on the chip at 32^3x64.

Round 3 found the blocked-aggregation relayout (12-dim transpose+reshape
of fine-volume arrays) hangs the tunnelled compiler at this volume and
moved MG setup to the host CPU — which then never finished.  This probes
the split-layout (no-transpose) formulation from mg/rc_mg_split.py piece
by piece, each variant in its own subprocess (driver shell) so a hang
can't take down the rest.

Usage: python probe_mg32_onchip.py <variant>
Variants: split_mgs split_restrict split_prolong split_term kernel_to_rc
          agg_restrict
Prints one line: VARIANT <name> ok compile=<s> run=<s>  (or raises).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DIMS = (32, 32, 32, 64)      # (X, Y, Z, T) extents, ref order
BLOCK = (4, 4, 4, 4)
NVEC = 12


def main(variant):
    import jax
    import jax.numpy as jnp
    from mugiq_tpu.profiling import enable_compilation_cache
    from mugiq_tpu.mg.transfer import BlockGeometry, block_edge_mask
    from mugiq_tpu.mg import rc_mg_split as sp

    enable_compilation_cache()
    print(f"backend: {jax.devices()}", flush=True)
    X, Y, Z, T = DIMS
    g = BlockGeometry(fine_dims=DIMS, block=BLOCK, ns_fine=4, nc_fine=3,
                      spin_block=2)
    key = jax.random.PRNGKey(0)

    def timed(fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        # forced completion: data-dependent readback (block_until_ready
        # does not block on this backend)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        tr = time.perf_counter() - t0
        return tc, tr

    if variant == "split_mgs":
        Vs = jax.random.normal(key, (NVEC, T // 4, 4, Z // 4, 4, Y // 4, 4,
                                     X // 4, 4, 2, 2, 3, 2), jnp.float32)
        fn = jax.jit(sp._mgs_orthonormalize_split)
        tc, tr = timed(fn, Vs)

    elif variant in ("split_restrict", "split_prolong", "split_term"):
        Vs = jax.random.normal(key, (NVEC, T // 4, 4, Z // 4, 4, Y // 4, 4,
                                     X // 4, 4, 2, 2, 3, 2), jnp.float32)
        tr_obj = sp.TransferRCSplit(geom=g, Vs=Vs)
        if variant == "split_restrict":
            psi = jax.random.normal(key, (T, Z, Y, X, 4, 3, 2), jnp.float32)
            fn = jax.jit(lambda V, p: sp.TransferRCSplit(geom=g, Vs=V)
                         .restrict(p))
            tc, tr = timed(fn, Vs, psi)
        elif variant == "split_prolong":
            phi = jax.random.normal(key, tr_obj.coarse_field_shape,
                                    jnp.float32)
            fn = jax.jit(lambda V, p: sp.TransferRCSplit(geom=g, Vs=V)
                         .prolong(p))
            tc, tr = timed(fn, Vs, phi)
        else:
            # one full Galerkin hop term: probes -> rc hop -> batched
            # masked restrict (the hot setup op, operands as jit args)
            from mugiq_tpu.rc.dirac_rc import _hop_term_rc
            U = jax.random.normal(key, (T, Z, Y, X, 3, 3, 2), jnp.float32)
            mask = block_edge_mask(g, 0, +1).astype(jnp.float32)

            def term(V, U_mu, m):
                t = sp.TransferRCSplit(geom=g, Vs=V)
                probes = t.probe_block(0)
                h = jax.vmap(lambda p: -0.12 * _hop_term_rc(U_mu, p, 0,
                                                            forward=True))(
                    probes)
                return (t.restrict_batch_cols(h, m),
                        t.restrict_batch_cols(h, 1.0 - m))

            fn = jax.jit(term)
            tc, tr = timed(fn, Vs, U, mask)

    elif variant == "kernel_to_rc":
        import mugiq_tpu.pallas.dslash_kernel as dk
        v = jax.random.normal(key, (NVEC, T, 24, Z, Y * X), jnp.float32)

        def conv(vk):
            pl = jax.vmap(lambda x: dk.from_kernel_spinor(x, Y=Y))(vk)
            return jnp.transpose(pl, (0, 4, 5, 6, 7, 2, 3, 1))

        fn = jax.jit(conv)
        tc, tr = timed(fn, v)

    elif variant == "agg_restrict":
        from mugiq_tpu.mg.rc_mg import TransferRC
        V = jax.random.normal(key, (T // 4, Z // 4, Y // 4, X // 4, 2,
                                    g.agg, NVEC, 2), jnp.float32)
        psi = jax.random.normal(key, (T, Z, Y, X, 4, 3, 2), jnp.float32)
        fn = jax.jit(lambda Va, p: TransferRC(geom=g, V=Va).restrict(p))
        tc, tr = timed(fn, V, psi)

    else:
        raise SystemExit(f"unknown variant {variant}")

    print(f"VARIANT {variant} ok compile={tc:.1f}s run={tr:.3f}s",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
