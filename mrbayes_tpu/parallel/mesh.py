"""Multi-chip sharding of the MC3 engine.

Two parallel axes (SURVEY §2.2):

* ``chains`` — runs×chains data-parallel (the reference's only distributed
  axis: one MC3 chain per MPI rank, src/mcmc.c:18331).  The chain axis of
  every state/bookkeeping array is sharded; the swap step reads each
  chain's (lnL, lnPrior) scalars, so XLA inserts the tiny all-gather the
  reference does with 5-double MPI_Isend/Irecv pairs (src/mcmc.c:831-856).
* ``sites`` — site-pattern model parallelism *within* a chain, the axis the
  reference left unbuilt (dead code at src/mcmc.c:18358-18372).  Pattern
  tensors are sharded on the pattern dimension; the root log-likelihood
  reduction becomes a psum over ICI inserted by GSPMD.

No explicit collectives are written: the engine is pure jit, and sharding
in = sharding propagated.  Multi-host runs use ``jax.distributed`` +
the same named shardings.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mcmc.engine import Engine


def make_mesh(n_chain_shards: int, n_site_shards: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_chain_shards * n_site_shards
    if devices.size < need:
        raise ValueError(f"need {need} devices, have {devices.size}")
    grid = devices[:need].reshape(n_chain_shards, n_site_shards)
    return Mesh(grid, ("chains", "sites"))


def put_global(x, sharding):
    """Place host data under a (possibly multi-process) sharding.  With
    one process this is jax.device_put; with several, every process
    holds the identical full host value (same seeds everywhere — the
    reference broadcasts its seeds for the same reason, src/bayes.c:499)
    and contributes its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def _pad_to_multiple(x: np.ndarray, axis: int, m: int):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, 0
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return np.pad(x, width), pad


def shard_engine_data(eng: Engine, mesh: Mesh) -> None:
    """Re-place the engine's per-division pattern tensors with the pattern
    dimension sharded over the ``sites`` mesh axis (zero-weight padding
    keeps shapes divisible; padded patterns contribute exactly 0 to lnL)."""
    from ..ops.pruning import _pallas_enabled
    from ..ops.pruning_pallas import PruningPallasSharded
    n_shards = mesh.shape["sites"]
    if n_shards == 1:
        return
    # pad the pattern axis to a multiple of shards*128 (weight-0
    # padding contributes exactly 0 to lnL) so each device's local
    # block is lane-aligned for the fused Pallas kernel
    mult = n_shards * 128 if _pallas_enabled() else n_shards
    tps, ws, cms, new_pruners = [], [], [], []
    for i, (tp, w, cm) in enumerate(zip(eng.tip_partials, eng.weights,
                                        eng.const_masks)):
        tp_h, _ = _pad_to_multiple(np.asarray(tp), 1, mult)
        w_h, _ = _pad_to_multiple(np.asarray(w), 0, mult)
        cm_h, _ = _pad_to_multiple(np.asarray(cm), 0, mult)
        tps.append(put_global(
            tp_h, NamedSharding(mesh, P(None, "sites", None))))
        ws.append(put_global(w_h, NamedSharding(mesh, P("sites"))))
        cms.append(put_global(
            cm_h, NamedSharding(mesh, P("sites", None))))
        # rebuild the division's fused pruner in the sharded layout
        # (same kernel per shard under shard_map); coding corrections
        # run as a separate replicated dummy pass, so no dummy columns
        # are appended here (division_loglik split_correction)
        if _pallas_enabled() and eng._pruners[i] is not None:
            new_pruners.append(PruningPallasSharded(
                tp_h, eng._pruner_cats[i], mesh))
        else:
            new_pruners.append(None)
    eng.tip_partials, eng.weights, eng.const_masks = tps, ws, cms
    eng._pruners = new_pruners
    eng._stacked_pruners = []
    eng._multiwalk_pruners = []
    # ascertainment corrections switch to the split (replicated
    # dummy-pass) form: appending dummy columns to a pattern-sharded
    # axis would fight GSPMD (ops/pruning.division_loglik)
    eng._site_sharded = True


def shard_chains(eng: Engine, mesh: Mesh, states: dict, bk: dict):
    """Place chain-indexed arrays sharded over the ``chains`` axis;
    cross-chain bookkeeping (temperature ids, swap stats, keys) is
    replicated — the swap decision is computed identically everywhere,
    mirroring the reference's shared swapSeed design (src/mcmc.c:5217)."""
    chain_sharded = NamedSharding(mesh, P("chains"))
    replicated = NamedSharding(mesh, P())

    def place_state(x):
        if x.ndim >= 1 and x.shape[0] == eng.mcmc.n_chains_total:
            return put_global(x, chain_sharded)
        return put_global(x, replicated)

    states = jax.tree.map(place_state, states)
    bk_out = {}
    for k, v in bk.items():
        if k in ("tuning", "tries", "accepts", "tries_total",
                 "accepts_total"):
            bk_out[k] = put_global(v, chain_sharded)
        else:
            bk_out[k] = put_global(v, replicated)
    return states, bk_out


def auto_mesh(n_chains_total: int, devices=None) -> Mesh:
    """Default mesh for a run: as many chain shards as divide both the
    chain count and the device count, remaining devices on the ``sites``
    axis.  The reference's analog constraint is numGlobalChains divisible
    by nProcs (src/mcmc.c:18331-18357); here non-dividing device counts
    degrade gracefully to fewer chain shards + site sharding instead of
    erroring."""
    import math
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    chain_shards = math.gcd(n_chains_total, n_dev)
    site_shards = n_dev // chain_shards
    return make_mesh(chain_shards, site_shards, devices)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (replaces MPI_Init, reference src/bayes.c:177)."""
    kwargs = {}
    if coordinator:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def gather_to_host(tree):
    """Full host copies of (possibly multi-process sharded) arrays on
    every process — the role of the reference's ReassembleParamVals
    gather to rank 0 (src/mcmc.c:14313), except every process gets the
    result so diagnostics stay replicated and no broadcast-back is
    needed."""
    import numpy as np
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda a: np.asarray(
            multihost_utils.process_allgather(a, tiled=True))
        if hasattr(a, "sharding") and not a.is_fully_addressable
        else np.asarray(a),
        tree)
