"""Bottom-up batched CU split RDO from device leaf-cost maps.

The reference decides the CU quad tree by top-down mutate-and-backtrack
recursion, fully coding every node at every level
(ref: src/xvc_enc_lib/cu_encoder.cc:123-273).  This module is the
split-decision stage of the TPU-first redesign (SURVEY.md §7 stage 4):
the open-loop 67-mode SATD cost maps of EVERY aligned square block of
the picture are computed as a handful of batched device calls
(tpu/lookahead.py, one dispatch per block size — the wavefront leaf
evaluation), and the quad split tree is then chosen by a vectorized
bottom-up dynamic program over those maps — fixed tensor stages instead
of recursion.

Because the leaf costs are open-loop (references from the original
picture) SATD proxies rather than closed-loop SSD+real-bits, the DP
only FORCES a decision where the margin is decisive; ambiguous nodes
fall back to the encoder's normal full search.  The result is a
conforming, reference-decodable bitstream whose RD cost tracks the full
search (pinned by tests/test_wavefront_rdo.py) while the quad recursion
is pruned wherever the device maps already settle it.

Cost model (integer, like the encoder's SATD pre-pass
ref: src/xvc_enc_lib/intra_search.cc:189-250):

  leaf(n)  = min_mode satd[n] + round(mode_bits * lambda_sqrt)
  split(n) = sum of 4 children best(n/2) + round(split_bits * lambda_sqrt)
  best(n)  = min(leaf, split)

force split where split * MARGIN_NUM < leaf * MARGIN_DEN,
force leaf  where leaf * MARGIN_NUM < split * MARGIN_DEN.
"""
import numpy as np

# decisive-margin ratio (10%): only force when one side wins by this.
# Forcing requires a decisive win: e.g. force split only when
# quad * MARGIN_NUM < leaf * MARGIN_DEN with NUM > DEN, i.e. the quad
# cost is at least NUM/DEN-1 = 10% below the leaf cost.  Near-ties
# satisfy neither inequality and stay UNDECIDED (full search).
MARGIN_NUM, MARGIN_DEN = 11, 10
# signaling-bit estimates at sqrt-lambda (coarse; absorbed by margin)
MODE_BITS = 5.0
SPLIT_BITS = 2.0

FORCE_SPLIT = 1
FORCE_LEAF = -1
UNDECIDED = 0


def split_dp_from_lookahead(maps, lambda_sqrt):
    """maps: {n: costs[bh, bw, 67] int32} from frame_intra_lookahead.
    Returns {n: force[bh, bw] int8} for every n that has a child map
    (force applies to quad-split decisions at size-n nodes)."""
    mode_cost = int(round(MODE_BITS * lambda_sqrt))
    split_cost = int(round(SPLIT_BITS * lambda_sqrt))
    best = {}
    leaf = {}
    for n in sorted(maps):
        leaf[n] = maps[n].min(axis=-1).astype(np.int64) + mode_cost
        half = n // 2
        if half in best:
            ch = best[half]
            bh, bw = leaf[n].shape
            # children may extend past the parent grid on non-multiple
            # frames; crop to the parent-covered region
            ch = ch[:2 * bh, :2 * bw]
            quad = (ch[0::2, 0::2] + ch[0::2, 1::2] +
                    ch[1::2, 0::2] + ch[1::2, 1::2]) + split_cost
            best[n] = np.minimum(leaf[n], quad)
        else:
            best[n] = leaf[n]
    force = {}
    for n in sorted(maps):
        half = n // 2
        if half not in best:
            continue
        ch = best[half][:2 * leaf[n].shape[0], :2 * leaf[n].shape[1]]
        quad = (ch[0::2, 0::2] + ch[0::2, 1::2] +
                ch[1::2, 0::2] + ch[1::2, 1::2]) + split_cost
        f = np.zeros(leaf[n].shape, np.int8)
        f[quad * MARGIN_NUM < leaf[n] * MARGIN_DEN] = FORCE_SPLIT
        f[leaf[n] * MARGIN_NUM < quad * MARGIN_DEN] = FORCE_LEAF
        force[n] = f
    return force


def decision_for(force_maps, pos_x, pos_y, width, height):
    """The DP decision for a square CU at (pos_x, pos_y): FORCE_SPLIT /
    FORCE_LEAF / UNDECIDED.  Non-square or unmapped nodes are
    UNDECIDED."""
    if force_maps is None or width != height:
        return UNDECIDED
    f = force_maps.get(width)
    if f is None or pos_x % width or pos_y % width:
        return UNDECIDED
    by, bx = pos_y // width, pos_x // width
    if by >= f.shape[0] or bx >= f.shape[1]:
        return UNDECIDED
    return int(f[by, bx])
