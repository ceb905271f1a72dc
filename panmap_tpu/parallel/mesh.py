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
