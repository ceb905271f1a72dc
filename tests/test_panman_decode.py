"""Vectorized panman mutation decode must equal the scalar pointer-walk
oracle on the real rsv_4K fixture (covers intra-segment and far pointers,
multi-word Mutation layouts, gap-position flags, packed nibble codes)."""

import lzma
import shutil

import numpy as np
import pytest

from panmap_tpu.io import panman as P
from panmap_tpu.io.capnp import CapnpMessage

PANMAN_SRC = "/root/reference/src/test/data/rsv_4K.panman"


@pytest.fixture(scope="module")
def msg_and_tree(tmp_path_factory):
    p = tmp_path_factory.mktemp("panman") / "rsv_4K.panman"
    shutil.copy(PANMAN_SRC, p)
    tree = P.load_panman(str(p))
    msg = CapnpMessage(lzma.open(str(p), "rb").read())
    return msg, tree


def test_fast_decode_matches_scalar(msg_and_tree):
    msg, tree = msg_and_tree
    nodes = msg.root().ptr(0).struct(0).ptr(1)
    order = tree.dfs_order
    assert P._decode_mutations_fast(msg, nodes, order), \
        "fast path rejected the fixture layout"
    snap = [(n.nm_block.copy(), n.nm_pos.copy(), n.nm_gap.copy(),
             n.nm_packed.copy(), list(n.block_mutations)) for n in order]
    P._decode_mutations_scalar(nodes, order)
    total = 0
    for (b, p, g, k, bm), n in zip(snap, order):
        assert np.array_equal(b, n.nm_block)
        assert np.array_equal(p, n.nm_pos)
        assert np.array_equal(g, n.nm_gap)
        assert np.array_equal(k, n.nm_packed)
        assert ([(x.block_id, x.is_insertion, x.is_inversion) for x in bm]
                == [(x.block_id, x.is_insertion, x.is_inversion)
                    for x in n.block_mutations])
        total += len(b)
    assert total > 100000  # the fixture is mutation-dense


def test_lazy_nuc_mutation_objects(msg_and_tree):
    _, tree = msg_and_tree
    node = next(n for n in tree.dfs_order if len(n.nm_block) > 2)
    objs = node.nuc_mutations
    assert len(objs) == len(node.nm_block)
    for o, bid, pos, gap, packed in zip(objs, node.nm_block.tolist(),
                                        node.nm_pos.tolist(),
                                        node.nm_gap.tolist(),
                                        node.nm_packed.tolist()):
        assert o.block_id == bid and o.nuc_position == pos
        assert o.nuc_gap_position == gap
        assert o.length == (packed & 0xFF) >> 4
        assert len(o.codes) == o.length
