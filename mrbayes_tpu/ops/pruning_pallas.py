"""Fused Felsenstein pruning as a single Pallas TPU kernel.

The lax.scan pruning pass in ``ops/pruning.py`` issues one XLA step per
internal node (gather two children, two small contractions, rescale,
scatter) — each step round-trips the [n_nodes, P, K, S] carry through HBM
and pays per-step overhead.  For phylogenetic trees (tens of nodes, a few
hundred site patterns) that overhead dominates the actual flops.

This kernel fuses the whole postorder pass: all node partials live in a
VMEM scratch buffer for the duration; each step is one [KS, KS] x [KS, P]
matmul per child (the rate-category axis folded into a block-diagonal
transition operator so the MXU sees a single dense contraction — the role
of the reference's SSE/AVX CondLikeDown_* kernels, src/likelihood.c:1121-
1417, with the pattern dimension on the 128-wide lane axis instead of SSE
lanes), an elementwise product, and an always-on per-pattern max-rescale
(role of CondLikeScaler_*, src/likelihood.c:4939-5612).

Layout:
  - patterns ride the lane axis (last dim, padded to 128),
  - (rate-cat, state) fold into the sublane axis (padded to 8),
  - the postorder is relabelled so step i writes slot n_tips+i; children
    are pre-resolved to slot indices on the XLA side, so the kernel only
    does leading-axis dynamic reads.

Grid: (chains, pattern blocks) — both embarrassingly parallel.  A
``jax.custom_batching.custom_vmap`` wrapper turns ``jax.vmap`` over chains
into the grid dimension, so the MC3 engine's vmapped generation step uses
the batched kernel transparently.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30



def _interp() -> bool:
    """MB_PALLAS_INTERPRET=1: run pallas_call in plain interpret mode
    (jax-native emulation).  Used by the CPU-mesh sharding tests — the
    TPU-semantics interpreter (pltpu.force_tpu_interpret_mode) becomes
    pathologically slow under shard_map, the plain interpreter does
    not.  Trace-time flag like the other MB_* switches."""
    return os.environ.get("MB_PALLAS_INTERPRET", "0") == "1"

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(lr_ref, bstep_ref, tips_ref, root_ref, ls_ref, cl_ref,
            *, n_tips: int, n_int: int):
    """One (chain, pattern-block) cell: full postorder pass in VMEM.

    lr_ref    SMEM [n_int, 2]   child slot indices per step
    bstep_ref VMEM [n_int, 2, KSp, KSp] block-diag tiprobs per step/child
    tips_ref  VMEM [n_tips, KSp, Pblk]  tiled tip partials (shared)
    root_ref  VMEM [KSp, Pblk]  root partials out
    ls_ref    VMEM [1, Pblk]    per-pattern log rescale sum out
    cl_ref    VMEM scratch [n_tips + n_int, KSp, Pblk]
    """
    cl_ref[0:n_tips] = tips_ref[:]
    ls_ref[:] = jnp.zeros_like(ls_ref)

    def step(i, _):
        l = lr_ref[i, 0]
        r = lr_ref[i, 1]
        bl = bstep_ref[i, 0]
        br = bstep_ref[i, 1]
        # precision=HIGHEST: full-f32 MXU passes — the default runs f32
        # through bf16 multiplies, biasing per-pattern lnL by ~1e-2
        # (matches mrbayes_tpu._set_matmul_precision; the kernel is
        # latency-bound so the extra passes are nearly free)
        wl = jnp.dot(bl, cl_ref[l], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        wr = jnp.dot(br, cl_ref[r], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        c = wl * wr
        m = jnp.maximum(jnp.max(c, axis=0, keepdims=True), _TINY)
        cl_ref[n_tips + i] = c / m
        ls_ref[:] = ls_ref[:] + jnp.log(m)
        return 0

    jax.lax.fori_loop(0, n_int, step, 0, unroll=False)
    root_ref[:] = cl_ref[n_tips + n_int - 1]


def _kernel_g(lr_ref, bstep_ref, tips_ref, root_ref, ls_ref, *cl_refs,
              n_tips: int, n_int: int):
    """One (chain-group, pattern-block) cell: G independent postorder
    walks interleaved in a single program.

    The serial kernel (`_kernel`) is latency-bound: each ~0.27 us step is
    a dependent chain of two tiny matmuls + rescale, and the grid walks
    every (chain, division) cell sequentially, so partitioned runs pay
    cells x n_int x latency (hymfossil: 60 cells x 113 steps = 72% of the
    generation).  Here each program advances G chains' walks per loop
    iteration — the G per-step bodies are data-independent, so Mosaic's
    scheduler overlaps their MXU/VPU ops and the per-step cost approaches
    throughput instead of G x latency.

    lr_ref    SMEM [G, n_int, 2]   child slot indices per walk/step
    bstep_ref VMEM [G, n_int, 2, KSp, KSp]
    tips_ref  VMEM [n_tips, KSp, Pblk]  (shared across the G walks)
    root_ref  VMEM [G, KSp, Pblk]
    ls_ref    VMEM [G, 1, Pblk]
    cl_refs   G VMEM scratches [n_tips + n_int, KSp, Pblk]
    """
    G = len(cl_refs)
    for g in range(G):
        cl_refs[g][0:n_tips] = tips_ref[:]
    ls_ref[:] = jnp.zeros_like(ls_ref)

    def step(i, _):
        ms = []
        for g in range(G):
            l = lr_ref[g, i, 0]
            r = lr_ref[g, i, 1]
            wl = jnp.dot(bstep_ref[g, i, 0], cl_refs[g][l],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            wr = jnp.dot(bstep_ref[g, i, 1], cl_refs[g][r],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            c = wl * wr
            m = jnp.maximum(jnp.max(c, axis=0, keepdims=True), _TINY)
            cl_refs[g][n_tips + i] = c / m
            ms.append(m)
        for g in range(G):
            ls_ref[g] = ls_ref[g] + jnp.log(ms[g])
        return 0

    jax.lax.fori_loop(0, n_int, step, 0, unroll=False)
    for g in range(G):
        root_ref[g] = cl_refs[g][n_tips + n_int - 1]


def _kernel_w(lr_ref, bstep_ref, tips_ref, root_ref, ls_ref, *cl_refs,
              n_tips: int, n_int: int, C: int):
    """One multiwalk grid cell: G independent postorder walks spanning
    (division, chain) pairs, interleaved in a single program.

    Walk ordering is division-major: global walk w = d*C + c.  A cell
    covers walks [j*G, (j+1)*G); the launch wrapper guarantees cells
    never straddle a division boundary when G < C (C % G == 0) and cover
    whole divisions when G >= C (C | G), so within a cell walk g's chain
    row is (j*G % C) + (g % C) and its division-local tips row is g // C.

    Compared to `_kernel_g` (chain-interleaved walks of ONE division)
    each walk here additionally carries its own transition operators and
    tip block — this is what lets a partitioned model's divisions share
    one launch without the block-diagonal union-state-width blowup that
    made `PruningPallasStacked` lose (each walk's matmuls stay at the
    bucket's max KSp, not the sum over divisions).

    lr_ref    SMEM [C, n_int, 2]   child slot indices per chain
    bstep_ref VMEM [G, n_int, 2, KSp, KSp]  per-walk tiprob blocks
    tips_ref  VMEM [R, n_tips, KSp, Pblk]   R = max(1, G//C) divisions
    root_ref  VMEM [G, KSp, Pblk]
    ls_ref    VMEM [G, 1, Pblk]
    cl_refs   G VMEM scratches [n_tips + n_int, KSp, Pblk]
    """
    G = len(cl_refs)
    if C % G == 0 and G < C:
        base = jax.lax.rem(pl.program_id(0) * G, C)
    else:
        base = 0
    for g in range(G):
        cl_refs[g][0:n_tips] = tips_ref[g // C]
    ls_ref[:] = jnp.zeros_like(ls_ref)

    def step(i, _):
        ms = []
        for g in range(G):
            c_row = base + (g % C)
            l = lr_ref[c_row, i, 0]
            r = lr_ref[c_row, i, 1]
            wl = jnp.dot(bstep_ref[g, i, 0], cl_refs[g][l],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            wr = jnp.dot(bstep_ref[g, i, 1], cl_refs[g][r],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            c = wl * wr
            m = jnp.maximum(jnp.max(c, axis=0, keepdims=True), _TINY)
            cl_refs[g][n_tips + i] = c / m
            ms.append(m)
        for g in range(G):
            ls_ref[g] = ls_ref[g] + jnp.log(ms[g])
        return 0

    jax.lax.fori_loop(0, n_int, step, 0, unroll=False)
    for g in range(G):
        root_ref[g] = cl_refs[g][n_tips + n_int - 1]


VMEM_CAP = 96 * 1024 * 1024      # v5e VMEM is 128 MiB; leave headroom


def kernel_vmem_bytes(n_tips: int, ksp: int, pblk: int) -> int:
    """Scoped-VMEM requirement of one grid cell: double-buffered bstep
    and tips input blocks, the full-slot scratch, and the (revisited)
    output blocks, with f32 tile padding applied (last dim to 128 lanes,
    second-to-last to 8 sublanes) plus fixed slack.  Mosaic's default
    scoped limit is 16 MiB; the pallas_call raises it to this estimate
    (v5e has 128 MiB)."""
    n_int = n_tips - 1
    n_slots = n_tips + n_int
    lane = _round_up(ksp, 128)           # bstep matrices' last dim
    sub = _round_up(ksp, 8)
    bstep_blk = n_int * 2 * sub * lane * 4
    tips_blk = n_tips * sub * pblk * 4
    scratch = n_slots * sub * pblk * 4
    outs = (sub * pblk + pblk) * 4
    return (2 * bstep_blk + 2 * tips_blk + scratch + 2 * outs
            + (1 << 20))


def group_vmem_bytes(n_tips: int, ksp: int, pblk: int, G: int) -> int:
    """Scoped-VMEM requirement of one G-walk grid cell (`_kernel_g`)."""
    n_int = n_tips - 1
    n_slots = n_tips + n_int
    lane = _round_up(ksp, 128)
    sub = _round_up(ksp, 8)
    bstep_blk = G * n_int * 2 * sub * lane * 4
    tips_blk = n_tips * sub * pblk * 4
    scratch = G * n_slots * sub * pblk * 4
    outs = G * (sub * pblk + pblk) * 4
    return (2 * bstep_blk + 2 * tips_blk + scratch + 2 * outs
            + (1 << 20))


def pick_group(C: int, n_tips: int, ksp: int) -> int:
    """Largest walk-interleave factor G (power of two <= 8) dividing the
    chain count whose grid cell still fits VMEM at the 128-lane minimum
    pattern block.

    MB_TPU_NO_INTERLEAVE is read at TRACE time: toggling it after a jit
    trace is cached has no effect (same semantics as
    MB_TPU_FORCE_PALLAS)."""
    if os.environ.get("MB_TPU_NO_INTERLEAVE", "0") == "1":
        return 1
    for G in (32, 16, 8, 4, 2):
        if C % G == 0 and group_vmem_bytes(n_tips, ksp, 128, G) \
                <= VMEM_CAP:
            return G
    return 1


def pick_pattern_block(n_tips: int, ksp: int, ppad: int) -> int | None:
    """Largest 128-multiple pattern block dividing ppad whose grid cell
    fits VMEM_CAP (Mosaic requires lane blocks to be 128-multiples or
    the full dimension); None when even 128 does not fit."""
    m = ppad // 128
    for d in range(m, 0, -1):
        if m % d:
            continue
        pblk = d * 128
        if kernel_vmem_bytes(n_tips, ksp, pblk) <= VMEM_CAP:
            return pblk
    return None


def _pick_pattern_block_g(n_tips: int, ksp: int, ppad: int,
                          G: int) -> int | None:
    """G-walk variant of pick_pattern_block (same 128-multiple rule)."""
    m = ppad // 128
    for d in range(m, 0, -1):
        if m % d:
            continue
        pblk = d * 128
        if group_vmem_bytes(n_tips, ksp, pblk, G) <= VMEM_CAP:
            return pblk
    return None


def _pallas_batched(lr, bstep, tips, n_tips: int):
    """lr [C, n_int, 2] int32; bstep [C, n_int, 2, KSp, KSp] f32;
    tips [n_tips, KSp, Ppad] f32 (shared across chains).
    Returns (root [C, KSp, Ppad], logscale [C, Ppad])."""
    C, n_int = lr.shape[0], lr.shape[1]
    ksp = bstep.shape[-1]
    ppad = tips.shape[-1]
    n_slots = n_tips + n_int
    G = pick_group(C, n_tips, ksp)
    pblk = _pick_pattern_block_g(n_tips, ksp, ppad, G)
    if pblk is None:
        raise ValueError("pruning kernel working set exceeds VMEM; "
                         "make_pruner should have fallen back")
    nblk = ppad // pblk
    vmem_limit = min(int(group_vmem_bytes(n_tips, ksp, pblk, G) * 1.15),
                     VMEM_CAP)

    grid = (C // G, nblk)
    kernel = functools.partial(_kernel_g, n_tips=n_tips, n_int=n_int)
    root, ls = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, n_int, 2), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, n_int, 2, ksp, ksp),
                         lambda c, b: (c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tips, ksp, pblk), lambda c, b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, ksp, pblk), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, pblk), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, ksp, ppad), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, ppad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, ksp, pblk), jnp.float32)
            for _ in range(G)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * n_int * 2 * ksp * ksp * ppad,
            bytes_accessed=C * (n_int * 2 * ksp * ksp + 2 * ksp * ppad) * 4,
            transcendentals=C * n_int * ppad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=_interp(),
    )(lr, bstep, tips)
    return root, ls[:, 0, :]


class PruningPallas:
    """Per-division static wiring + the callable pruning op.

    Built once per (division, engine); callable maps traced per-chain
    (order, left, right, P-tensor) to (root partials [P, K, S],
    logscale [P]).  ``tips`` is the constant [n_tips, P, S] tip-partial
    tensor; K is the number of rate categories.
    """

    def __init__(self, tips: np.ndarray, n_cats: int):
        n_tips, P, S = tips.shape
        self.n_tips, self.P, self.S, self.K = n_tips, P, S, n_cats
        self.KS = n_cats * S
        self.KSp = _round_up(self.KS, 8)
        self.Ppad = _round_up(P, 128)
        t = np.ones((n_tips, self.KSp, self.Ppad), np.float32)
        tt = np.transpose(np.asarray(tips, np.float32), (0, 2, 1))  # n,S,P
        tiled = np.tile(tt, (1, n_cats, 1))                         # n,KS,P
        t[:, :self.KS, :P] = tiled
        t[:, self.KS:, :] = 0.0
        self.tips_dev = jnp.asarray(t)
        # block-diagonal expansion mask: eye(K) kron pattern
        self._eyeK = jnp.eye(n_cats, dtype=jnp.float32)

    def block_diag(self, Pmat):
        """[n_nodes, K, S, S] -> [n_nodes, KSp, KSp] block diagonal."""
        n = Pmat.shape[0]
        B = jnp.einsum("nksj,kl->nkslj", Pmat.astype(jnp.float32),
                       self._eyeK)
        B = B.reshape(n, self.KS, self.KS)
        if self.KSp != self.KS:
            B = jnp.pad(B, ((0, 0), (0, self.KSp - self.KS),
                            (0, self.KSp - self.KS)))
        return B

    def __call__(self, order, left, right, Pmat, parent=None):
        """order [n_int] postorder internal-node ids; left/right [n_nodes];
        Pmat [n_nodes, K, S, S].  Returns (root [P, K, S], logscale [P]).
        ``parent`` is accepted for interface parity with the wavefront
        variant (unused here)."""
        n_tips = self.n_tips
        n_int = order.shape[0]
        n_nodes = left.shape[0]
        # slot relabelling: node order[i] computes into slot n_tips + i
        slot = jnp.zeros((n_nodes,), jnp.int32)
        slot = slot.at[:n_tips].set(jnp.arange(n_tips, dtype=jnp.int32))
        slot = slot.at[order].set(n_tips
                                  + jnp.arange(n_int, dtype=jnp.int32))
        lchild = left[order]
        rchild = right[order]
        lr = jnp.stack([slot[lchild], slot[rchild]], axis=-1)  # [n_int, 2]
        B = self.block_diag(Pmat)
        bstep = jnp.stack([B[lchild], B[rchild]], axis=1)  # [n_int,2,KSp,KSp]
        root, ls = self._launch(lr, bstep)
        root = root[:self.KS, :self.P].reshape(self.K, self.S, self.P)
        return jnp.transpose(root, (2, 0, 1)), ls[:self.P]

    def _launch(self, lr, bstep):
        return _pruning_root(lr, bstep, self.tips_dev, self.n_tips)


def _pruning_root(lr, bstep, tips, n_tips: int):
    """Unbatched entry: one chain. vmap lifts to the kernel's grid."""
    return _make_pruning_root(n_tips)(lr, bstep, tips)


@functools.lru_cache(maxsize=None)
def _make_pruning_root(n_tips: int):
    @jax.custom_batching.custom_vmap
    def fn(lr, bstep, tips):
        root, ls = _pallas_batched(lr[None], bstep[None], tips, n_tips)
        return root[0], ls[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, lr, bstep, tips):
        lr_b, bstep_b, tips_b = in_batched
        if not lr_b:
            lr = jnp.broadcast_to(lr[None], (axis_size,) + lr.shape)
        if not bstep_b:
            bstep = jnp.broadcast_to(bstep[None],
                                     (axis_size,) + bstep.shape)
        if tips_b:
            tips = tips[0]   # tips identical across chains by construction
        root, ls = _pallas_batched(lr, bstep, tips, n_tips)
        return (root, ls), (True, True)

    return fn


class PruningPallasSharded(PruningPallas):
    """Site-sharded variant: the pattern axis of the tip layout lives
    sharded over the ``sites`` mesh axis, and the launch runs the SAME
    fused kernel per shard under ``jax.shard_map`` — lr/bstep
    replicated, each device pruning its local pattern block.  The root
    reduction (pattern-weighted sum) happens OUTSIDE on the globally
    sharded outputs, where GSPMD inserts the psum over ICI (the axis
    the reference never built, src/mcmc.c:18358-18372).

    The engine's ``shard_engine_data`` pads every division's pattern
    count to a multiple of ``n_shards * 128`` (weight-0 padding) so the
    per-device block is lane-aligned.  vmap over chains composes: the
    chain axis batches through the shard_map body, where the
    custom_vmap rule lifts it onto the kernel grid per shard."""

    def __init__(self, tips: np.ndarray, n_cats: int, mesh):
        from jax.sharding import NamedSharding, PartitionSpec
        super().__init__(tips, n_cats)
        n_shards = mesh.shape["sites"]
        if self.Ppad % (128 * n_shards):
            raise ValueError("pattern axis not divisible by shards*128; "
                             "shard_engine_data must pad first")
        self.mesh = mesh
        host = np.asarray(self.tips_dev)
        self.tips_dev = jax.device_put(
            host, NamedSharding(mesh, PartitionSpec(None, None, "sites")))

    def _launch(self, lr, bstep):
        from jax.sharding import PartitionSpec as P
        n_tips = self.n_tips
        fn = jax.shard_map(
            lambda l, b, t: _pruning_root(l, b, t, n_tips),
            mesh=self.mesh,
            in_specs=(P(), P(), P(None, None, "sites")),
            out_specs=(P(None, "sites"), P("sites")),
            check_vma=False)
        return fn(lr, bstep, self.tips_dev)


# ---------------------------------------------------------------------------
# Wavefront (level-batched) kernel: instead of one serial fori_loop step
# per internal node (dependent chain length n_int), group nodes into
# root-distance levels — every node at distance k depends only on nodes
# at distance > k — and compute each level row (up to W nodes) as ONE
# block-diagonal [2W*KSp, 2W*KSp] x [2W*KSp, Pblk] MXU contraction.  The
# dependent chain shrinks from n_int to ~tree height (+ level splits),
# the diagnosed latency bound of the serial kernel (ROOFLINE.json).


def _kernel_wavefront(nrows_ref, row_lr_ref, row_out_ref, bidx_ref,
                      wmask_ref, bstep_ref, tips_ref, root_ref, ls_ref,
                      cl_ref, bd_ref, cbuf_ref,
                      *, n_tips: int, n_int: int, W: int, ksp: int):
    """One (chain, pattern-block) grid cell.

    nrows_ref  SMEM [1, 1]         number of live schedule rows
    row_lr_ref SMEM [1, R*W*2]     child slot ids (trash slot when pad);
                                   flattened because SMEM pads every
                                   trailing dim to the 128-lane tile
    row_out_ref SMEM [1, R*W]      output slot ids
    bidx_ref   SMEM [1, R*W]       bstep row per (row, w) (n_int = pad)
    wmask_ref  SMEM [1, R*W]       1.0 live / 0.0 pad (logscale gating)
    bstep_ref  VMEM [n_int+1, 2, KSp, KSp]  per-node child tiprob blocks
    cl_ref     VMEM scratch [n_tips + n_int + 1, KSp, Pblk] (+1 = trash)
    bd_ref     VMEM scratch [2W*KSp, 2W*KSp] block-diagonal operator
    cbuf_ref   VMEM scratch [2W*KSp, Pblk]   gathered child partials
    """
    cl_ref[0:n_tips] = tips_ref[:]
    # trash slot: read by padded schedule entries; keep it finite so the
    # (masked) rescale math stays NaN-free
    cl_ref[n_tips + n_int] = jnp.ones_like(cl_ref[0])
    ls_ref[:] = jnp.zeros_like(ls_ref)

    def row_step(r, _):
        # static python loops over the row width: Mosaic supports dynamic
        # indices on REFS (SMEM scalar loads, VMEM leading-axis
        # reads/writes) but not dynamic_slice on VALUES, so every value
        # index below is a python int
        bd_ref[:] = jnp.zeros_like(bd_ref)
        for i in range(2 * W):
            w = i // 2
            c = i % 2
            child = row_lr_ref[0, (r * W + w) * 2 + c]
            b = bidx_ref[0, r * W + w]
            cbuf_ref[i * ksp:(i + 1) * ksp, :] = cl_ref[child]
            bd_ref[i * ksp:(i + 1) * ksp, i * ksp:(i + 1) * ksp] = \
                bstep_ref[b, c]
        prod = jnp.dot(bd_ref[:], cbuf_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        pr = prod.reshape(W, 2, ksp, -1)
        cc = pr[:, 0] * pr[:, 1]                      # [W, KSp, Pblk]
        m = jnp.maximum(jnp.max(cc, axis=1), _TINY)   # [W, Pblk]
        cc = cc / m[:, None, :]
        lsum = jnp.zeros_like(ls_ref[0])
        for w in range(W):
            cl_ref[row_out_ref[0, r * W + w]] = cc[w]
            # select, not multiply: padded entries hold trash-slot math
            # whose log may be non-finite, and NaN*0 = NaN
            lsum = lsum + jnp.where(wmask_ref[0, r * W + w] > 0.0,
                                    jnp.log(m[w]), 0.0)
        ls_ref[:] = ls_ref[:] + lsum[None, :]
        return 0

    jax.lax.fori_loop(0, nrows_ref[0, 0], row_step, 0)
    root_ref[:] = cl_ref[n_tips + n_int - 1]


def wavefront_vmem_bytes(n_tips: int, ksp: int, pblk: int, W: int) -> int:
    n_int = n_tips - 1
    lane = _round_up(ksp, 128)
    sub = _round_up(ksp, 8)
    bstep_blk = (n_int + 1) * 2 * sub * lane * 4
    tips_blk = n_tips * sub * pblk * 4
    scratch = (n_tips + n_int + 1) * sub * pblk * 4
    twk = 2 * W * ksp
    bd = _round_up(twk, 8) * _round_up(twk, 128) * 4
    cbuf = _round_up(twk, 8) * pblk * 4
    outs = (sub * pblk + pblk) * 4
    return (2 * bstep_blk + 2 * tips_blk + scratch + bd + cbuf
            + 2 * outs + (1 << 20))


def _pallas_batched_wavefront(nrows, row_lr, row_out, bidx, wmask, bstep,
                              tips, n_tips: int, W: int):
    """nrows [C,1,1] i32; row_lr [C,R*W*2]; row_out [C,R*W];
    bidx [C,R*W]; wmask [C,R*W] f32; bstep [C,n_int+1,2,KSp,KSp];
    tips [n_tips,KSp,Ppad].  Returns (root [C,KSp,Ppad], ls [C,Ppad])."""
    C = row_lr.shape[0]
    R = row_lr.shape[-1] // (2 * W)
    n_int = n_tips - 1
    ksp = bstep.shape[-1]
    ppad = tips.shape[-1]
    pblk = pick_pattern_block(n_tips, ksp, ppad)
    while pblk is not None and pblk > 128 and \
            wavefront_vmem_bytes(n_tips, ksp, pblk, W) > VMEM_CAP:
        pblk //= 2
    if pblk is None or wavefront_vmem_bytes(n_tips, ksp, pblk, W) > VMEM_CAP:
        raise ValueError("wavefront kernel working set exceeds VMEM")
    nblk = ppad // pblk
    twk = 2 * W * ksp
    vmem_limit = min(int(wavefront_vmem_bytes(n_tips, ksp, pblk, W) * 1.15),
                     VMEM_CAP)
    grid = (C, nblk)
    kernel = functools.partial(_kernel_wavefront, n_tips=n_tips,
                               n_int=n_int, W=W, ksp=ksp)
    root, ls = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, 1), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, R * W * 2), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, R * W), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, R * W), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, R * W), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n_int + 1, 2, ksp, ksp),
                         lambda c, b: (c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tips, ksp, pblk), lambda c, b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, ksp, pblk), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, pblk), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, ksp, ppad), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, ppad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_tips + n_int + 1, ksp, pblk), jnp.float32),
            pltpu.VMEM((twk, twk), jnp.float32),
            pltpu.VMEM((twk, pblk), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * R * twk * twk * pblk // 4,
            bytes_accessed=C * ((n_int + 1) * 2 * ksp * ksp
                                + 2 * ksp * ppad) * 4,
            transcendentals=C * n_int * ppad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=_interp(),
    )(nrows, row_lr, row_out, bidx, wmask, bstep, tips)
    return root, ls[:, 0, :]


class PruningPallasWavefront(PruningPallas):
    """Level-batched variant for deep trees with small state spaces.

    Schedule is recomputed per call from the traced topology: nodes
    grouped by root distance (node_depths is already computed for the
    postorder, so the only extra traced work is the within-level rank
    bookkeeping and four small scatters)."""

    def __init__(self, tips: np.ndarray, n_cats: int, W: int = 8):
        super().__init__(tips, n_cats)
        self.W = W

    def __call__(self, order, left, right, Pmat, parent=None):
        assert parent is not None, "wavefront pruner needs parent"
        n_tips = self.n_tips
        n_int = order.shape[0]
        n_nodes = left.shape[0]
        W = self.W
        from .traversal import node_depths
        depth = node_depths(parent)
        d = depth[order]                        # descending (stable sort)
        pos = jnp.arange(n_int)
        b = jnp.concatenate([jnp.ones((1,), bool), d[1:] != d[:-1]])
        start = jax.lax.cummax(jnp.where(b, pos, 0))
        within = pos - start
        newrow = b | (within % W == 0)
        row = jnp.cumsum(newrow.astype(jnp.int32)) - 1
        col = within % W
        n_rows = row[-1] + 1
        slot = jnp.zeros((n_nodes,), jnp.int32)
        slot = slot.at[:n_tips].set(jnp.arange(n_tips, dtype=jnp.int32))
        slot = slot.at[order].set(
            n_tips + jnp.arange(n_int, dtype=jnp.int32))
        lchild = slot[left[order]]
        rchild = slot[right[order]]
        trash = jnp.int32(n_tips + n_int)
        R = n_int
        flat = row * W + col
        # scatter-free schedule materialization: TPU scatters lower to
        # serial loops, so build the [R*W] tables with ONE one-hot
        # matmul instead of four .at[].set scatters
        oh = (flat[:, None] == jnp.arange(R * W)[None, :]).astype(
            jnp.float32)                          # [n_int, R*W]
        occupied = jnp.sum(oh, axis=0) > 0.0
        ivals = jnp.stack([lchild.astype(jnp.float32),
                           rchild.astype(jnp.float32),
                           (n_tips + jnp.arange(n_int)).astype(
                               jnp.float32),
                           jnp.arange(n_int).astype(jnp.float32)], 1)
        packed = jnp.einsum("nf,nk->fk", oh, ivals)   # [R*W, 4]
        lr0 = jnp.where(occupied, packed[:, 0].astype(jnp.int32), trash)
        lr1 = jnp.where(occupied, packed[:, 1].astype(jnp.int32), trash)
        row_lr = jnp.stack([lr0, lr1], axis=1).reshape(-1)
        row_out = jnp.where(occupied, packed[:, 2].astype(jnp.int32),
                            trash)
        bidx = jnp.where(occupied, packed[:, 3].astype(jnp.int32),
                         jnp.int32(n_int))
        wmask = occupied.astype(jnp.float32)
        B = self.block_diag(Pmat)
        bstep = jnp.stack([B[left[order]], B[right[order]]], axis=1)
        bstep = jnp.concatenate(
            [bstep, jnp.zeros((1,) + bstep.shape[1:], bstep.dtype)], 0)
        root, ls = _wavefront_root(
            jnp.asarray([[n_rows]], jnp.int32), row_lr[None], row_out[None],
            bidx[None], wmask[None], bstep, self.tips_dev, n_tips, W)
        root = root[:self.KS, :self.P].reshape(self.K, self.S, self.P)
        return jnp.transpose(root, (2, 0, 1)), ls[:self.P]


def _wavefront_root(nrows, row_lr, row_out, bidx, wmask, bstep, tips,
                    n_tips: int, W: int):
    return _make_wavefront_root(n_tips, W)(nrows, row_lr, row_out, bidx,
                                           wmask, bstep, tips)


@functools.lru_cache(maxsize=None)
def _make_wavefront_root(n_tips: int, W: int):
    @jax.custom_batching.custom_vmap
    def fn(nrows, row_lr, row_out, bidx, wmask, bstep, tips):
        root, ls = _pallas_batched_wavefront(
            nrows[None], row_lr[None], row_out[None], bidx[None],
            wmask[None], bstep[None], tips, n_tips, W)
        return root[0], ls[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, nrows, row_lr, row_out, bidx, wmask,
              bstep, tips):
        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
        nrows = bc(nrows, in_batched[0])
        row_lr = bc(row_lr, in_batched[1])
        row_out = bc(row_out, in_batched[2])
        bidx = bc(bidx, in_batched[3])
        wmask = bc(wmask, in_batched[4])
        bstep = bc(bstep, in_batched[5])
        if in_batched[6]:
            tips = tips[0]   # identical across chains by construction
        root, ls = _pallas_batched_wavefront(
            nrows, row_lr, row_out, bidx, wmask, bstep, tips, n_tips, W)
        return (root, ls), (True, True)

    return fn


class PruningPallasStacked:
    """ONE kernel launch for a GROUP of divisions sharing a tree.

    The hymfossil profile showed per-division kernel launches dominate
    partitioned likelihoods (15 launches, each serially re-walking the
    same 113-node postorder).  Divisions stack block-diagonally on the
    state axis (KS_total = sum K_d*S_d) and concatenate on the pattern
    axis; a pattern's tip partials live only in its division's block, so
    zeros propagate and each pattern's math involves only its own
    division — one postorder walk computes every division's root
    partials (same fused kernel as PruningPallas, bigger operands).

    ``specs``: [(tips_with_dummies [n, P_d, S_d], n_cats_d)] per
    division, in group order.
    """

    def __init__(self, specs):
        n_tips = specs[0][0].shape[0]
        self.n_tips = n_tips
        self.block = []       # (state offset, KS_d, K_d, S_d)
        self.prange = []      # (pattern offset, P_d)
        off = pof = 0
        for tp, k in specs:
            _, P, S = tp.shape
            self.block.append((off, k * S, k, S))
            self.prange.append((pof, P))
            off += k * S
            pof += P
        self.KS = off
        self.KSp = _round_up(off, 8)
        self.P_tot = pof
        self.Ppad = _round_up(pof, 128)
        t = np.zeros((n_tips, self.KSp, self.Ppad), np.float32)
        for (tp, k), (boff, ks, kk, S), (p0, P) in zip(
                specs, self.block, self.prange):
            tt = np.transpose(np.asarray(tp, np.float32), (0, 2, 1))
            t[:, boff:boff + ks, p0:p0 + P] = np.tile(tt, (1, kk, 1))
        self.tips_dev = jnp.asarray(t)

    def __call__(self, order, left, right, P_list, parent=None):
        """P_list: per-division [n_nodes, K_d, S_d, S_d] transition
        tensors.  Returns RAW (root [KSp, Ppad], logscale [Ppad]) — the
        caller slices per-division blocks/pattern ranges."""
        n_tips = self.n_tips
        n_int = order.shape[0]
        n_nodes = left.shape[0]
        B = jnp.zeros((n_nodes, self.KSp, self.KSp), jnp.float32)
        for Pd, (boff, ks, kk, S) in zip(P_list, self.block):
            eyeK = jnp.eye(kk, dtype=jnp.float32)
            Bd = jnp.einsum("nksj,kl->nkslj", Pd.astype(jnp.float32),
                            eyeK).reshape(n_nodes, ks, ks)
            B = B.at[:, boff:boff + ks, boff:boff + ks].set(Bd)
        slot = jnp.zeros((n_nodes,), jnp.int32)
        slot = slot.at[:n_tips].set(jnp.arange(n_tips, dtype=jnp.int32))
        slot = slot.at[order].set(n_tips
                                  + jnp.arange(n_int, dtype=jnp.int32))
        lchild = left[order]
        rchild = right[order]
        lr = jnp.stack([slot[lchild], slot[rchild]], axis=-1)
        bstep = jnp.stack([B[lchild], B[rchild]], axis=1)
        return _pruning_root(lr, bstep, self.tips_dev, n_tips)

    def div_view(self, root, ls, gi):
        """(root [K,S,P], logscale [P]) of member division gi from the
        raw stacked kernel outputs."""
        boff, ks, kk, S = self.block[gi]
        p0, P = self.prange[gi]
        r = root[boff:boff + ks, p0:p0 + P].reshape(kk, S, P)
        return r, ls[p0:p0 + P]


# ---------------------------------------------------------------------------
# Multiwalk kernel: ONE launch for a GROUP of divisions sharing a tree,
# with each (division, chain) pair as an independent interleaved walk.
#
# This is the third design against the partitioned-model bottleneck
# (hymfossil: 15 per-division launches = 72% of a generation, each
# serially re-walking the same 113-node postorder):
#   - wavefront level-batching LOST (~9 us/row assembly vs ~1 us/step),
#   - block-diagonal division stacking LOST (union state width
#     multiplies every pattern's MXU passes by the group size),
#   - here each walk keeps its OWN scratch and its own [KSp, KSp]
#     operators (KSp = the group's max rate-cat x state width, NOT the
#     sum), so per-step cost approaches the single-division kernel's
#     while the serial grid shrinks from sum_d(cells_d) launches to
#     ceil(D*C/G) cells in one launch.


def multiwalk_vmem_bytes(n_tips: int, ksp: int, pblk: int, G: int,
                         R: int) -> int:
    """Scoped-VMEM requirement of one `_kernel_w` grid cell."""
    n_int = n_tips - 1
    n_slots = n_tips + n_int
    lane = _round_up(ksp, 128)
    sub = _round_up(ksp, 8)
    bstep_blk = G * n_int * 2 * sub * lane * 4
    tips_blk = R * n_tips * sub * pblk * 4
    scratch = G * n_slots * sub * pblk * 4
    outs = G * (sub * pblk + pblk) * 4
    return (2 * bstep_blk + 2 * tips_blk + scratch + 2 * outs
            + (1 << 20))


def pick_multiwalk_group(W: int, C: int, n_tips: int, ksp: int) -> int:
    """Largest interleave factor G (power of two <= 8) such that cells
    tile the division-major walk list cleanly: G | W, and either chains
    divide into cells (C | G) or cells divide into a chain run
    (C % G == 0)."""
    for G in (8, 4, 2):
        if W % G:
            continue
        if not (C % G == 0 or G % C == 0):
            continue
        R = max(1, G // C)
        if multiwalk_vmem_bytes(n_tips, ksp, 128, G, R) <= VMEM_CAP:
            return G
    return 1


def _pallas_multiwalk(lr, bstep, tips, n_tips: int, C: int):
    """lr [C, n_int, 2] int32; bstep [D*C, n_int, 2, KSp, KSp] f32 in
    division-major walk order (walk w = d*C + c); tips
    [D, n_tips, KSp, Ppad] f32.  Returns (root [D*C, KSp, Ppad],
    logscale [D*C, Ppad])."""
    n_int = lr.shape[1]
    W = bstep.shape[0]
    ksp = bstep.shape[-1]
    ppad = tips.shape[-1]
    n_slots = n_tips + n_int
    G = pick_multiwalk_group(W, C, n_tips, ksp)
    R = max(1, G // C)
    m = ppad // 128
    pblk = None
    for d in range(m, 0, -1):
        if m % d:
            continue
        if multiwalk_vmem_bytes(n_tips, ksp, d * 128, G, R) <= VMEM_CAP:
            pblk = d * 128
            break
    if pblk is None:
        raise ValueError("multiwalk kernel working set exceeds VMEM; "
                         "the engine grouping should have split this")
    nblk = ppad // pblk
    vmem_limit = min(int(multiwalk_vmem_bytes(n_tips, ksp, pblk, G, R)
                         * 1.15), VMEM_CAP)
    grid = (W // G, nblk)
    kernel = functools.partial(_kernel_w, n_tips=n_tips, n_int=n_int, C=C)
    root, ls = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, n_int, 2), lambda j, b: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, n_int, 2, ksp, ksp),
                         lambda j, b: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, n_tips, ksp, pblk),
                         lambda j, b: ((j * G) // (C * R), 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, ksp, pblk), lambda j, b: (j, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, pblk), lambda j, b: (j, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, ksp, ppad), jnp.float32),
            jax.ShapeDtypeStruct((W, 1, ppad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, ksp, pblk), jnp.float32)
            for _ in range(G)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * W * n_int * 2 * ksp * ksp * ppad,
            bytes_accessed=W * (n_int * 2 * ksp * ksp
                                + 2 * ksp * ppad) * 4,
            transcendentals=W * n_int * ppad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=_interp(),
    )(lr, bstep, tips)
    return root, ls[:, 0, :]


def _multiwalk_root(lr, bstep, tips, n_tips: int):
    """Unbatched entry: one chain (walks = divisions).  vmap over chains
    expands walks to (division, chain) pairs in one launch."""
    return _make_multiwalk_root(n_tips)(lr, bstep, tips)


@functools.lru_cache(maxsize=None)
def _make_multiwalk_root(n_tips: int):
    @jax.custom_batching.custom_vmap
    def fn(lr, bstep, tips):
        root, ls = _pallas_multiwalk(lr[None], bstep, tips, n_tips, 1)
        return root, ls

    @fn.def_vmap
    def _rule(axis_size, in_batched, lr, bstep, tips):
        C = axis_size
        lr_b, bstep_b, tips_b = in_batched
        if not lr_b:
            lr = jnp.broadcast_to(lr[None], (C,) + lr.shape)
        if not bstep_b:
            bstep = jnp.broadcast_to(bstep[None], (C,) + bstep.shape)
        if tips_b:
            tips = tips[0]   # identical across chains by construction
        D = bstep.shape[1]
        # division-major walk order: [C, D, ...] -> [D*C, ...]
        bstep_w = jnp.swapaxes(bstep, 0, 1).reshape(
            (D * C,) + bstep.shape[2:])
        root, ls = _pallas_multiwalk(lr, bstep_w, tips, n_tips, C)
        ksp, ppad = root.shape[-2], root.shape[-1]
        root = jnp.swapaxes(root.reshape(D, C, ksp, ppad), 0, 1)
        ls = jnp.swapaxes(ls.reshape(D, C, ppad), 0, 1)
        return (root, ls), (True, True)

    return fn


class PruningPallasMultiwalk:
    """ONE kernel launch for a group of divisions sharing a tree, one
    interleaved walk per (division, chain) pair.

    ``specs``: [(tips_with_dummies [n, P_d, S_d], n_cats_d)] per member
    division.  All members pad to the group's max KSp (state axis) and
    max Ppad (pattern axis); the caller slices per-division views out of
    the raw outputs with ``div_view``.
    """

    def __init__(self, specs):
        n_tips = specs[0][0].shape[0]
        self.n_tips = n_tips
        self.D = len(specs)
        self.meta = []        # (KS_d, K_d, S_d, P_d)
        ks_max = p_max = 0
        for tp, k in specs:
            _, P, S = tp.shape
            self.meta.append((k * S, k, S, P))
            ks_max = max(ks_max, k * S)
            p_max = max(p_max, P)
        self.KSp = _round_up(ks_max, 8)
        self.Ppad = _round_up(p_max, 128)
        t = np.ones((self.D, n_tips, self.KSp, self.Ppad), np.float32)
        for d, (tp, k) in enumerate(specs):
            _, P, S = tp.shape
            tt = np.transpose(np.asarray(tp, np.float32), (0, 2, 1))
            t[d, :, :k * S, :P] = np.tile(tt, (1, k, 1))
            t[d, :, k * S:, :] = 0.0
        self.tips_dev = jnp.asarray(t)

    def __call__(self, order, left, right, P_list, parent=None):
        """P_list: per-division [n_nodes, K_d, S_d, S_d] transition
        tensors.  Returns RAW per-chain (root [D, KSp, Ppad],
        logscale [D, Ppad]); slice members with ``div_view``."""
        n_tips = self.n_tips
        n_int = order.shape[0]
        n_nodes = left.shape[0]
        slot = jnp.zeros((n_nodes,), jnp.int32)
        slot = slot.at[:n_tips].set(jnp.arange(n_tips, dtype=jnp.int32))
        slot = slot.at[order].set(n_tips
                                  + jnp.arange(n_int, dtype=jnp.int32))
        lchild = left[order]
        rchild = right[order]
        lr = jnp.stack([slot[lchild], slot[rchild]], axis=-1)
        bsteps = []
        for Pd, (ks, kk, S, _) in zip(P_list, self.meta):
            eyeK = jnp.eye(kk, dtype=jnp.float32)
            Bd = jnp.einsum("nksj,kl->nkslj", Pd.astype(jnp.float32),
                            eyeK).reshape(n_nodes, ks, ks)
            if ks != self.KSp:
                Bd = jnp.pad(Bd, ((0, 0), (0, self.KSp - ks),
                                  (0, self.KSp - ks)))
            bsteps.append(jnp.stack([Bd[lchild], Bd[rchild]], axis=1))
        bstep = jnp.stack(bsteps)        # [D, n_int, 2, KSp, KSp]
        return _multiwalk_root(lr, bstep, self.tips_dev, n_tips)

    def div_view(self, root, ls, gi):
        """(root [K,S,P], logscale [P]) of member division gi from the
        raw kernel outputs."""
        ks, kk, S, P = self.meta[gi]
        r = root[gi, :ks, :P].reshape(kk, S, P)
        return r, ls[gi, :P]
