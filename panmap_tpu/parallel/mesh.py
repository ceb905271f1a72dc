"""Multi-chip sharding for placement scoring and read sketching.

The reference is single-node shared-memory (SURVEY §2.3); this module is the
TPU-native replacement: a 1-D `jax.sharding.Mesh` over chips, seed-change rows
split across devices, per-shard partial per-node metric sums combined with a
`psum` over ICI, and the (cheap, replicated) Euler-tour prefix finishing the
scores on every chip.  Read batches shard the same way for sketching (data
parallel per chip).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def pad_rows(arr: np.ndarray, multiple: int, fill=0):
    n = len(arr)
    pad = (-n) % multiple
    if pad == 0:
        return arr
    return np.concatenate([arr, np.full(pad, fill, dtype=arr.dtype)])


def make_sharded_score_fn(mesh: Mesh, n_nodes: int):
    """Placement scoring with rows sharded over the mesh.

    Row tensors are sharded on axis 0; the read table and tree tensors are
    replicated. Per-shard segment sums reduce with psum so every chip holds the
    full per-node metric accumulators.
    """

    def _shard_body(row_id, row_parent, row_child, row_node,
                    read_ids, read_logc):
        pos = jnp.searchsorted(read_ids, row_id)
        posc = jnp.clip(pos, 0, jnp.maximum(read_ids.shape[0] - 1, 0))
        found = jnp.where(read_ids.shape[0] > 0, read_ids[posc] == row_id, False)
        lrc = jnp.where(found, read_logc[posc], 0.0)
        P_ = row_parent
        C = row_child
        log_child = jnp.where(C > 0, jnp.log1p(C), 0.0)
        log_parent = jnp.where(P_ > 0, jnp.log1p(P_), 0.0)
        mag_delta = log_child * log_child - log_parent * log_parent
        active = ((C - P_) != 0) & found
        became_present = ((P_ == 0) & (C != 0)).astype(jnp.float32)
        became_absent = ((C == 0) & (P_ != 0)).astype(jnp.float32)
        presence_delta = jnp.where(active, became_present - became_absent, 0.0)
        old_contrib = jnp.where(P_ > 0, lrc / jnp.maximum(P_, 1.0), 0.0)
        new_contrib = jnp.where(C > 0, lrc / jnp.maximum(C, 1.0), 0.0)
        old_wc = jnp.where(P_ > 0, 1.0 / jnp.maximum(P_, 1.0), 0.0)
        new_wc = jnp.where(C > 0, 1.0 / jnp.maximum(C, 1.0), 0.0)
        lograw_delta = jnp.where(active, new_contrib - old_contrib, 0.0)
        logcos_delta = jnp.where(active, lrc * (log_child - log_parent), 0.0)
        wc_delta = jnp.where(active, new_wc - old_wc, 0.0)
        logcont_delta = presence_delta * lrc
        deltas = jnp.stack(
            [mag_delta, lograw_delta, logcos_delta, wc_delta, logcont_delta,
             presence_delta], axis=1)
        partial = jax.ops.segment_sum(deltas, row_node, num_segments=n_nodes)
        return jax.lax.psum(partial, "data")  # partial metric sums ride ICI

    sharded = shard_map(
        _shard_body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P(None), P(None)),
        out_specs=P(None),
        check_rep=False,
    )

    @jax.jit
    def score(row_id, row_parent, row_child, row_node, euler_in, euler_out,
              read_ids, read_logc):
        node_sums = sharded(row_id, row_parent, row_child, row_node,
                            read_ids, read_logc)
        slots = jnp.zeros((2 * n_nodes + 1, node_sums.shape[1]), jnp.float32)
        slots = slots.at[euler_in].add(node_sums)
        slots = slots.at[euler_out + 1].add(-node_sums)
        pref = jnp.cumsum(slots, axis=0)
        return pref[euler_in]

    return score


def make_sharded_sketch_fn(mesh: Mesh, k: int, s: int, t: int, open_: bool):
    """Data-parallel read sketching over the mesh: reads shard on axis 0,
    each chip sketches its shard (see sketch/tpu.py for the kernel math)."""
    from ..sketch.tpu import syncmer_scan_batch

    def _body(reads, lengths):
        return syncmer_scan_batch(reads, lengths, k, s, t, open_)

    return shard_map(
        _body,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_rep=False,
    )


def make_sharded_em_fn(mesh: Mesh, eta: float = 1e-5,
                       max_change_threshold: float = 0.0,
                       max_iterations: int = 1000):
    """SQUAREM EM with READS sharded over the mesh (SURVEY §5.8: E-step
    sufficient statistics — per-node responsibility sums and the log
    likelihood — are psum'd over ICI every iteration; proportions stay
    replicated).  Mirrors meta.engine._get_masked_squarem numerically.

    Inputs: S u16[R, M] score matrix (sharded on axis 0), lens i32[R],
    w f32[R] (sharded), alive bool[M] (replicated).  R must divide the mesh.
    Returns the replicated proportions f32[M]."""
    import numpy as _np

    from ..meta.engine import ERROR_RATE

    log_err = float(_np.log(ERROR_RATE))
    log_1me = float(_np.log1p(-ERROR_RATE))
    eta32 = float(eta)
    mct = float(max_change_threshold)

    def _body(S, lens, w, alive):
        Sf = S.astype(jnp.float32)
        lp = (lens.astype(jnp.float32)[:, None] - Sf) * log_err + Sf * log_1me
        wsum = jax.lax.psum(jnp.sum(w), "data")

        def em(p):
            lg = lp + jnp.log(p)[None, :]
            mx = jnp.max(lg, axis=1, keepdims=True)
            e = jnp.exp(lg - mx)
            den = jnp.sum(e, axis=1, keepdims=True)
            local = jnp.sum(w[:, None] * (e / den), axis=0)
            return jax.lax.psum(local, "data") / wsum

        def llh(p):
            lg = lp + jnp.log(p)[None, :]
            mx = jnp.max(lg, axis=1)
            local = jnp.sum(w * (mx + jnp.log(
                jnp.sum(jnp.exp(lg - mx[:, None]), axis=1))))
            return jax.lax.psum(local, "data")

        def norm(p):
            p = jnp.where(alive, jnp.maximum(p, 1e-12), 0.0)
            return p / jnp.sum(p)

        def cond(carry):
            _, _, it, done = carry
            return (~done) & (it < max_iterations)

        def body(carry):
            p0, cur, it, _ = carry
            p1 = norm(em(p0))
            p2 = norm(em(p1))
            r = p1 - p0
            v = (p2 - p1) - r
            vn = jnp.linalg.norm(v)
            alpha = jnp.where(vn > 0, -jnp.linalg.norm(r) / vn, -1.0)
            psq = norm(p0 - 2.0 * alpha * r + alpha * alpha * v)
            l2 = llh(p2)
            lsq = llh(psq)
            use_sq = lsq > l2 - eta32
            pn = jnp.where(use_sq, psq, p2)
            ln = jnp.where(use_sq, lsq, l2)
            diff = ln - cur
            if mct == 0:
                done = jnp.abs(diff) < eta32
            else:
                done = jnp.max(jnp.abs(pn - p0)) < mct
            return pn, ln, it + 1, done

        n_alive = jnp.sum(alive)
        p0 = jnp.where(alive, 1.0 / jnp.maximum(n_alive, 1), 0.0)
        p, _, _, _ = jax.lax.while_loop(
            cond, body,
            (p0, jnp.float32(-jnp.inf), jnp.int32(0), jnp.bool_(False)))
        return p

    sharded = shard_map(
        _body, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(None)),
        out_specs=P(None), check_rep=False)
    return jax.jit(sharded)
