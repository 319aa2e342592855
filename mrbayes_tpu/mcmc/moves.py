"""MCMC proposal moves as pure traced functions.

Every move maps ``(key, state, tuning) -> (new_state, ln_hastings)`` where
``state`` is the flat chain-state dict (see engine.py).  Prior ratios are
NOT returned: the engine recomputes the full log-prior and uses the
difference (the reference instead returns analytic lnPriorRatio from each of
its 91 Move_* functions, src/proposal.c; full recompute is cheap on TPU and
removes a whole class of ratio bugs).

Topology moves are array surgery on the (parent, left, right) node arrays
under the unrooted root-at-tip-0 convention (see trees.py).  Out-of-bounds
proposals return ``ln_hastings = -inf`` so the Metropolis step auto-rejects
(the reference's abortMove pattern, src/mcmc.c:16805).

References for behavior: Move_NNI src/proposal.c:8064, Move_ExtSPR
src/proposal.c:2026, Move_BrLen multiplier, Move_TreeLen
src/proposal.c:17136, Dirichlet moves src/proposal.c:390 ff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30
BRLEN_MIN = 1e-6
BRLEN_MAX = 100.0


def _masked_choice(key, mask):
    """Uniform choice of an index where mask is True."""
    logits = jnp.where(mask, 0.0, NEG_INF)
    return jax.random.categorical(key, logits)


def _replace_child(state, node, old, new):
    """Replace child `old` of `node` with `new`; fix parent links."""
    left = state["left"]
    right = state["right"]
    is_l = left[node] == old
    left = left.at[node].set(jnp.where(is_l, new, left[node]))
    right = right.at[node].set(jnp.where(is_l, right[node], new))
    parent = state["parent"].at[new].set(node)
    return {**state, "left": left, "right": right, "parent": parent}


def _free_branch_mask(state, n_tips, rooted=False):
    """Branches with a sampled length: every node except the root; in the
    unrooted (tip-0-rooted) convention tip 0's slot is also fixed at 0
    (its pendant edge rides on the basal node).  ``rooted=True`` is the
    rooted non-clock case (directional models): tip 0 is an ordinary
    branch."""
    n_nodes = 2 * n_tips - 1
    mask = jnp.ones((n_nodes,), bool).at[n_nodes - 1].set(False)
    if not rooted:
        mask = mask.at[0].set(False)
    return mask


def _subtree_mask(parent, v):
    import math
    n = parent.shape[-1]
    idx = jnp.arange(n)
    anc = jnp.where(parent < 0, idx, parent)
    hit = idx == v
    for _ in range(max(1, math.ceil(math.log2(n)))):
        hit = hit | jnp.take(hit, anc)
        anc = jnp.take(anc, anc)
    return hit


def _desc_matrix(parent):
    """[n, n] bool closure: D[a, i] = i is in the subtree of a (a is an
    ancestor-or-self of i).  One pointer-doubling pass batched over ALL
    nodes — same kernel count as a single _subtree_mask call, so any
    move needing several subtree/ancestor masks should build this once
    (D[a, :] = subtree of a; D[:, a] = ancestors-or-self of a)."""
    import math
    n = parent.shape[-1]
    idx = jnp.arange(n)
    anc = jnp.where(parent < 0, idx, parent)
    hit = idx[:, None] == idx[None, :]
    for _ in range(max(1, math.ceil(math.log2(n)))):
        hit = hit | jnp.take(hit, anc, axis=1)
        anc = jnp.take(anc, anc)
    return hit


# ---------------------------------------------------------------------------
# topology moves


def move_nni(key, state, tuning, n_tips):
    """Nearest-neighbor interchange across a random internal edge."""
    root = 2 * n_tips - 2
    parent, left, right = state["parent"], state["left"], state["right"]
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    # v internal, not root, parent not root => (u,v) is an internal edge
    mask = (idx >= n_tips) & (idx != root) & (parent != root)
    v = _masked_choice(k1, mask)
    u = parent[v]
    s = jnp.where(left[u] == v, right[u], left[u])       # sibling of v
    swap_left = jax.random.bernoulli(k2)
    c = jnp.where(swap_left, left[v], right[v])           # child of v to swap
    st = _replace_child(state, v, c, s)
    st = _replace_child(st, u, s, c)
    return st, jnp.float32(0.0)


def move_spr(key, state, tuning, n_tips):
    """Random subtree prune-and-regraft with uniform edge-proportion
    reinsertion.  lnH = log(t_target / (t_sib + t_pruned_parent))."""
    root = 2 * n_tips - 2
    parent, left, right, blen = (state["parent"], state["left"],
                                 state["right"], state["blen"])
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    basal = left[root]
    # prune candidates: any node except root, tip0, basal
    vmask = (idx != root) & (idx != 0) & (idx != basal)
    v = _masked_choice(k1, vmask)
    p = parent[v]
    g = parent[p]
    s = jnp.where(left[p] == v, right[p], left[p])
    merged = blen[s] + blen[p]
    # regraft candidates: not in subtree(v), not root, not tip0, not p, not s
    sub = _subtree_mask(parent, v)
    wmask = (~sub) & (idx != root) & (idx != 0) & (idx != p) & (idx != s)
    w = _masked_choice(k2, wmask)
    t_w = blen[w]
    u_split = jax.random.uniform(k3)

    # surgery: detach p (attach s under g with merged length)
    st = _replace_child(state, g, p, s)
    st = {**st, "blen": st["blen"].at[s].set(merged)}
    # insert p above w
    gw = st["parent"][w]
    st = _replace_child(st, gw, w, p)
    st = _replace_child(st, p, s, w)   # p's non-v child slot now holds w
    blen2 = st["blen"].at[p].set(u_split * t_w).at[w].set(
        (1.0 - u_split) * t_w)
    st = {**st, "blen": blen2}
    lnH = jnp.log(jnp.maximum(t_w, 1e-35)) - \
        jnp.log(jnp.maximum(merged, 1e-35))
    ok = (jnp.sum(wmask) > 0) & (w != v)
    return st, jnp.where(ok, lnH, NEG_INF)


def _ancestor_path_mask(parent, v):
    """Mask of ancestors-or-self of node v (the v..root path)."""
    n = parent.shape[-1]

    def cond(c):
        return c[0] >= 0

    def body(c):
        cur, mask = c
        return parent[cur], mask.at[cur].set(True)

    _, mask = jax.lax.while_loop(
        cond, body, (v, jnp.zeros((n,), bool)))
    return mask


def move_ext_spr(key, state, tuning, n_tips):
    """Extending SPR (reference Move_ExtSPR, src/proposal.c:2026,
    re-expressed as a no-backtracking edge walk): prune a random subtree,
    walk outward from the attachment edge for a geometric number of steps
    (continue probability = tuning), regraft at the edge reached, splitting
    it at a uniform point.  The Hastings ratio is the classic endpoint
    correction — only the stop factors at the two path ends differ between
    the forward and reverse walks — plus the uniform-split edge-length
    ratio.  Walk bookkeeping mirrors the extension mechanism of Lakner et
    al. 2008 that the reference implements with pointer surgery."""
    root = 2 * n_tips - 2
    parent, left, right, blen = (state["parent"], state["left"],
                                 state["right"], state["blen"])
    k1, kd, kw, ku = jax.random.split(key, 4)
    idx = jnp.arange(2 * n_tips - 1)
    basal = left[root]
    vmask = (idx != root) & (idx != 0) & (idx != basal)
    v = _masked_choice(k1, vmask)
    p = parent[v]
    g = parent[p]
    s = jnp.where(left[p] == v, right[p], left[p])
    merged = blen[s] + blen[p]
    # detach p: s hangs under g with the merged edge
    st = _replace_child(state, g, p, s)
    st = {**st, "blen": st["blen"].at[s].set(merged)}
    L, R, P = st["left"], st["right"], st["parent"]
    pext = jnp.clip(tuning, 0.05, 0.95)

    def tip_far(w, toward):
        # far endpoint of edge-above-w walking toward w (0) or parent (1);
        # parent==root means the far endpoint is tip 0 (unrooted convention)
        return jnp.where(toward == 0, w < n_tips, P[w] == root)

    d0 = jax.random.bernoulli(kd)

    def cond(c):
        return ~c[4]

    def body(c):
        key, w, toward, k, done, at_tip0 = c
        key, ks, kc = jax.random.split(key, 3)
        at_tip = tip_far(w, toward)
        stop = at_tip | (jax.random.uniform(ks) > pext)
        u = P[w]
        sib = jnp.where(L[u] == w, R[u], L[u])
        choice = jax.random.bernoulli(kc)
        nw = jnp.where(toward == 0,
                       jnp.where(choice, L[w], R[w]),
                       jnp.where(choice, sib, u))
        nt = jnp.where(toward == 0, 0,
                       jnp.where(choice, 0, 1)).astype(jnp.int32)
        return (key,
                jnp.where(stop, w, nw),
                jnp.where(stop, toward, nt),
                k + jnp.where(stop, 0, 1),
                stop, at_tip)

    _, w, _, k, _, stopped_at_tip = jax.lax.while_loop(
        cond, body,
        (kw, s, d0.astype(jnp.int32), jnp.int32(0),
         jnp.bool_(False), jnp.bool_(False)))

    # Hastings: endpoint stop factors (reverse walk re-enters the start
    # edge heading the opposite direction)
    rev_tip = tip_far(s, 1 - d0.astype(jnp.int32))
    ln_stop_fwd = jnp.where(stopped_at_tip, 0.0, jnp.log1p(-pext))
    ln_stop_rev = jnp.where(rev_tip, 0.0, jnp.log1p(-pext))
    lnH_walk = jnp.where(k > 0, ln_stop_rev - ln_stop_fwd, 0.0)

    # regraft p onto the edge above w, splitting at a uniform point
    t_w = st["blen"][w]
    u_split = jax.random.uniform(ku)
    gw = P[w]
    st = _replace_child(st, gw, w, p)
    st = _replace_child(st, p, s, w)
    blen2 = st["blen"].at[p].set(u_split * t_w).at[w].set(
        (1.0 - u_split) * t_w)
    st = {**st, "blen": blen2}
    lnH = lnH_walk + jnp.log(jnp.maximum(t_w, 1e-35)) \
        - jnp.log(jnp.maximum(merged, 1e-35))
    return st, lnH


def move_local(key, state, tuning, n_tips):
    """LOCAL move of Larget & Simon 1999 (reference Move_Local,
    src/proposal.c:6317): pick an internal edge (v,u); build the
    three-edge backbone a—u—v—c (a drawn from u's other neighbors, c
    from v's children); scale the backbone by exp(lambda(U-1/2)); slide
    one endpoint of v's edge uniformly along the new backbone, changing
    topology when it crosses the other endpoint.  Hastings ratio is
    3·log(m*/m) — the uniform-reinsertion variant the reference
    implements (src/proposal.c:6477)."""
    root = 2 * n_tips - 2
    parent, left, right, blen = (state["parent"], state["left"],
                                 state["right"], state["blen"])
    k1, kc, ka, km, kx, ky = jax.random.split(key, 6)
    idx = jnp.arange(2 * n_tips - 1)
    # internal edge: v internal, v not root, parent(v) not root
    mask = (idx >= n_tips) & (idx != root) & (parent != root)
    v = _masked_choice(k1, mask)
    u = parent[v]
    # crown: c the backbone child of v (d = other child, rides along)
    c = jnp.where(jax.random.bernoulli(kc), left[v], right[v])
    # root part: up = walk through u's sibling edge; down = through u's
    # parent edge (reference directionUp)
    s = jnp.where(left[u] == v, right[u], left[u])
    g = parent[u]
    direction_up = jax.random.bernoulli(ka)
    a = jnp.where(direction_up, s, g)
    # backbone edge above the a-end: blen[a] (up) or blen[u] (down)
    x = jnp.where(direction_up, blen[a], blen[u])
    y = x + blen[v]
    old_m = y + blen[c]
    new_m = jnp.exp(tuning * (jax.random.uniform(km) - 0.5)) * old_m
    move_x = jax.random.bernoulli(kx)
    r = jax.random.uniform(ky)
    scale = new_m / old_m
    new_x = jnp.where(move_x, r * new_m, x * scale)
    new_y = jnp.where(move_x, y * scale, r * new_m)
    topo = new_x > new_y
    lo = jnp.minimum(new_x, new_y)
    hi = jnp.maximum(new_x, new_y)
    seg = jnp.stack([lo, hi - lo, new_m - hi])
    ok = jnp.all((seg >= BRLEN_MIN) & (seg <= BRLEN_MAX))
    lnH = 3.0 * jnp.log(scale)

    def no_topo(st):
        b = st["blen"].at[c].set(new_m - new_y).at[v].set(new_y - new_x)
        slot = jnp.where(direction_up, a, u)
        return {**st, "blen": b.at[slot].set(new_x)}

    def topo_up(st):
        # u's v-slot <- c; v's c-slot <- a; u's a-slot <- v
        st = _replace_child(st, u, v, c)
        st = _replace_child(st, v, c, a)
        st = _replace_child(st, u, a, v)
        b = (st["blen"].at[c].set(new_m - new_x)
             .at[v].set(new_x - new_y).at[a].set(new_y))
        return {**st, "blen": b}

    def topo_down(st):
        # u's v-slot <- c; v's c-slot <- u; a(=g)'s u-slot <- v
        st = _replace_child(st, u, v, c)
        st = _replace_child(st, v, c, u)
        st = _replace_child(st, a, u, v)
        b = (st["blen"].at[c].set(new_m - new_x)
             .at[u].set(new_x - new_y).at[v].set(new_y))
        return {**st, "blen": b}

    st = jax.lax.cond(
        topo,
        lambda s_: jax.lax.cond(direction_up, topo_up, topo_down, s_),
        no_topo, state)
    return st, jnp.where(ok, lnH, NEG_INF)


def _reroot_pruned(state, v, c, u_split):
    """Re-root the pruned subtree hanging from v: place the (degree-2)
    junction v on the edge above c, reversing parent links on the
    c→v path and merging v's two old root edges.  Returns the new state
    and log|Jacobian| of the merge+split length change.  Used by
    move_ext_tbr (reference Move_ExtTBR crown rearrangement,
    src/proposal.c:5047)."""
    st = state
    L0, R0, P0, B0 = (state["left"], state["right"], state["parent"],
                      state["blen"])
    x, y = L0[v], R0[v]
    m1 = B0[x] + B0[y]
    identity = (c == x) | (c == y)
    q = P0[c]
    t_c = B0[c]

    # walk the path q -> ... -> child-of-v, reversing each edge.  NB: the
    # loop must be total under vmap (lax.cond lowers to select, so this
    # body executes even for identity lanes) — start those lanes done.
    def cond(carry):
        return ~carry[4]

    def body(carry):
        left, right, par, blen, done, prev, cur = carry
        nxt = P0[cur]
        last = nxt == v
        other = jnp.where(L0[v] == cur, R0[v], L0[v])
        new_child = jnp.where(last, other, nxt)
        is_l = left[cur] == prev
        left = left.at[cur].set(
            jnp.where(is_l, new_child, left[cur]))
        right = right.at[cur].set(
            jnp.where(is_l, right[cur], new_child))
        par = par.at[new_child].set(cur)
        blen = blen.at[new_child].set(jnp.where(last, m1, B0[cur]))
        return (left, right, par, blen, last, cur, nxt)

    left, right, par, blen, _, _, _ = jax.lax.while_loop(
        cond, body,
        (st["left"], st["right"], st["parent"], st["blen"],
         identity, c, q))
    # v's children become (c, q); split the old edge above c
    left = left.at[v].set(c)
    right = right.at[v].set(q)
    par = par.at[c].set(v).at[q].set(v)
    blen = blen.at[c].set(u_split * t_c).at[q].set(
        (1.0 - u_split) * t_c)
    lnJ = (jnp.log(jnp.maximum(t_c, 1e-35))
           - jnp.log(jnp.maximum(m1, 1e-35)))
    rerooted = {**st, "left": left, "right": right, "parent": par,
                "blen": blen}
    out = jax.tree.map(lambda a, b: jnp.where(identity, a, b),
                       st, rerooted)
    return out, jnp.where(identity, 0.0, lnJ)


def move_ext_tbr(key, state, tuning, n_tips):
    """Extending TBR (reference Move_ExtTBR, src/proposal.c:5047): bisect
    a random internal edge (v, parent(v)); on the root side, walk outward
    with extension probability ``tuning`` to choose the reattachment edge
    (exactly the ExtSPR walk); on the crown side, walk down from the
    pruned subtree's merged root edge to choose a new root edge and
    re-root the subtree there.  Hastings combines the two walks' endpoint
    stop factors with the two merge/split length Jacobians."""
    root = 2 * n_tips - 2
    parent, left, right, blen = (state["parent"], state["left"],
                                 state["right"], state["blen"])
    k1, kd1, kw1, ku1, kd2, kw2, ku2 = jax.random.split(key, 7)
    idx = jnp.arange(2 * n_tips - 1)
    basal = left[root]
    # internal edge: v internal, not root, not basal (edge to tip 0)
    vmask = (idx >= n_tips) & (idx != root) & (idx != basal)
    v = _masked_choice(k1, vmask)
    p = parent[v]
    g = parent[p]
    s = jnp.where(left[p] == v, right[p], left[p])
    merged = blen[s] + blen[p]
    # detach p: s hangs under g with the merged edge
    st = _replace_child(state, g, p, s)
    st = {**st, "blen": st["blen"].at[s].set(merged)}
    pext = jnp.clip(tuning, 0.05, 0.95)

    # --- crown side: walk down from the merged root edge of subtree(v)
    x, y = st["left"][v], st["right"][v]
    d0 = jnp.where(jax.random.bernoulli(kd1), x, y)
    Lc, Rc = st["left"], st["right"]

    def cond1(carry):
        return ~carry[3]

    def body1(carry):
        key, w, k, done, at_tip = carry
        key, ks, kc = jax.random.split(key, 3)
        is_tip = w < n_tips
        stop = is_tip | (jax.random.uniform(ks) > pext)
        nw = jnp.where(jax.random.bernoulli(kc), Lc[w], Rc[w])
        return (key, jnp.where(stop, w, nw),
                k + jnp.where(stop, 0, 1), stop, is_tip)

    _, c, k1n, _, c_tip = jax.lax.while_loop(
        cond1, body1, (kw1, d0, jnp.int32(0), jnp.bool_(False),
                       jnp.bool_(False)))
    # reverse crown walk ends at the old merged edge; its continuation
    # is blocked only if the old endpoint child is a tip
    o0 = jnp.where(d0 == x, y, x)
    rev1_tip = o0 < n_tips
    ln_stop_f1 = jnp.where(c_tip, 0.0, jnp.log1p(-pext))
    ln_stop_r1 = jnp.where(rev1_tip, 0.0, jnp.log1p(-pext))
    lnH1_walk = jnp.where(k1n > 0, ln_stop_r1 - ln_stop_f1, 0.0)
    st, lnH1_len = _reroot_pruned(st, v, c, jax.random.uniform(ku1))

    # --- root side: the ExtSPR walk from s, then reattach p above w
    L, R, P = st["left"], st["right"], st["parent"]

    def tip_far(w, toward):
        return jnp.where(toward == 0, w < n_tips, P[w] == root)

    d2 = jax.random.bernoulli(kd2)

    def cond2(carry):
        return ~carry[4]

    def body2(carry):
        key, w, toward, k, done, at_tip0 = carry
        key, ks, kc = jax.random.split(key, 3)
        at_tip = tip_far(w, toward)
        stop = at_tip | (jax.random.uniform(ks) > pext)
        u = P[w]
        sib = jnp.where(L[u] == w, R[u], L[u])
        choice = jax.random.bernoulli(kc)
        nw = jnp.where(toward == 0,
                       jnp.where(choice, L[w], R[w]),
                       jnp.where(choice, sib, u))
        nt = jnp.where(toward == 0, 0,
                       jnp.where(choice, 0, 1)).astype(jnp.int32)
        return (key, jnp.where(stop, w, nw),
                jnp.where(stop, toward, nt),
                k + jnp.where(stop, 0, 1), stop, at_tip)

    _, w, _, k2n, _, w_tip = jax.lax.while_loop(
        cond2, body2,
        (kw2, s, d2.astype(jnp.int32), jnp.int32(0),
         jnp.bool_(False), jnp.bool_(False)))
    rev2_tip = tip_far(s, 1 - d2.astype(jnp.int32))
    ln_stop_f2 = jnp.where(w_tip, 0.0, jnp.log1p(-pext))
    ln_stop_r2 = jnp.where(rev2_tip, 0.0, jnp.log1p(-pext))
    lnH2_walk = jnp.where(k2n > 0, ln_stop_r2 - ln_stop_f2, 0.0)

    t_w = st["blen"][w]
    u_split = jax.random.uniform(ku2)
    gw = st["parent"][w]
    st = _replace_child(st, gw, w, p)
    st = _replace_child(st, p, s, w)
    blen2 = st["blen"].at[p].set(u_split * t_w).at[w].set(
        (1.0 - u_split) * t_w)
    st = {**st, "blen": blen2}
    lnH2_len = (jnp.log(jnp.maximum(t_w, 1e-35))
                - jnp.log(jnp.maximum(merged, 1e-35)))
    lnH = lnH1_walk + lnH1_len + lnH2_walk + lnH2_len
    return st, lnH


def move_subtree_swap(key, state, tuning, n_tips):
    """Swap two non-nested subtrees (role of reference Move_ExtSS,
    src/proposal.c:4118, with a uniform partner choice and an exact
    count-based Hastings correction: the number of eligible partners
    depends on the topology, so q is asymmetric)."""
    root = 2 * n_tips - 2
    parent, left = state["parent"], state["left"]
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    basal = left[root]
    base = (idx != root) & (idx != 0) & (idx != basal)
    v = _masked_choice(k1, base)

    def partner_mask(desc, par, a):
        # non-nested with a, not a's sibling (sibling swap is the
        # identity); one closure matrix serves all four mask queries
        return (base & ~desc[a, :] & ~desc[:, a] & (par != par[a]))

    desc = _desc_matrix(parent)
    wm_v = partner_mask(desc, parent, v)
    w = _masked_choice(k2, wm_v)
    c_v = jnp.sum(wm_v)
    c_w = jnp.sum(partner_mask(desc, parent, w))
    pv, pw = parent[v], parent[w]
    st = _replace_child(state, pv, v, w)
    st = _replace_child(st, pw, w, v)
    par2 = st["parent"]
    desc2 = _desc_matrix(par2)
    c2_v = jnp.sum(partner_mask(desc2, par2, v))
    c2_w = jnp.sum(partner_mask(desc2, par2, w))

    def inv(c):
        return 1.0 / jnp.maximum(c, 1).astype(jnp.float32)

    lnH = jnp.log(inv(c2_v) + inv(c2_w)) - jnp.log(inv(c_v) + inv(c_w))
    ok = c_v > 0
    return st, jnp.where(ok, lnH, NEG_INF)


def make_pars_spr_move(pars_masks, pars_factors):
    """Parsimony-biased SPR (reference Move_ParsSPR, src/proposal.c:10067;
    Fitch machinery GetParsDP src/mcmc.c:4849, InitParsSets :6834).

    Prune a random subtree, Fitch-downpass the remaining tree on bit-coded
    state sets, score every candidate regraft edge w by the weighted count
    of patterns where (set(w) | set(parent(w))) has no overlap with the
    pruned subtree's set (each such pattern forces >= 1 extra change),
    then pick the target from a softmax over -warp-scaled scores.  The
    Hastings ratio is the forward/reverse softmax probability ratio (the
    root-part scores are unchanged by the reattachment, so the reverse
    distribution reuses them — same trick as the reference), plus the
    uniform edge-split factor.

    pars_masks: [n_tips, Ptot] uint32 state bitmasks over all divisions'
    patterns; pars_factors: [Ptot] pattern weight x division warp factor
    -log(1/S - exp(-S/(S-1) v_t)/S) with v_typical = 0.03 (the reference
    default tuningParam[2]).  The softmax temperature (warp) is the
    autotuned ``tuning``.
    """
    from ..ops.traversal import postorder_internal

    def move(key, state, tuning, n_tips):
        root = 2 * n_tips - 2
        n_nodes = 2 * n_tips - 1
        parent, left, blen = state["parent"], state["left"], state["blen"]
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jnp.arange(n_nodes)
        basal = left[root]
        vmask = (idx != root) & (idx != 0) & (idx != basal)
        v = _masked_choice(k1, vmask)
        p = parent[v]
        g = parent[p]
        s = jnp.where(left[p] == v, state["right"][p], left[p])
        merged = blen[s] + blen[p]
        st = _replace_child(state, g, p, s)
        st = {**st, "blen": st["blen"].at[s].set(merged)}
        P2, L2, R2 = st["parent"], st["left"], st["right"]

        # Fitch downpass on the detached tree (p's own set is junk but p
        # is excluded from the candidates)
        F = jnp.zeros((n_nodes, pars_masks.shape[1]), jnp.uint32)
        F = F.at[:n_tips].set(pars_masks)
        order = postorder_internal(P2, n_tips)

        def fstep(F, w):
            a, b = F[L2[w]], F[R2[w]]
            inter = a & b
            return F.at[w].set(jnp.where(inter > 0, inter, a | b)), None

        F, _ = jax.lax.scan(fstep, F, order)

        # candidate scores: d(w) = warp * sum_p factor_p [no overlap]
        par_eff = jnp.where(P2 == root, 0, jnp.maximum(P2, 0))
        y = (F | F[par_eff]) & F[v][None, :]
        d = tuning * jnp.sum(
            jnp.where(y == 0, pars_factors[None, :], 0.0), axis=-1)

        sub = _subtree_mask(P2, v)
        cmask = (~sub) & (idx != root) & (idx != 0) & (idx != p)
        fwd_mask = cmask & (idx != s)
        valid = jnp.any(fwd_mask)
        fwd_logits = jnp.where(fwd_mask, -d, NEG_INF)
        # no candidate (v's subtree spans all but the sibling): abort —
        # the reference's abortMove guard (src/proposal.c:10160)
        c = jnp.where(valid, jax.random.categorical(k2, fwd_logits), s)
        lnq_fwd = fwd_logits[c] - jax.scipy.special.logsumexp(fwd_logits)
        rev_logits = jnp.where(cmask & (idx != c), -d, NEG_INF)
        lnq_rev = rev_logits[s] - jax.scipy.special.logsumexp(rev_logits)

        # reattach p onto the edge above c, splitting uniformly
        t_c = st["blen"][c]
        u_split = jax.random.uniform(k3)
        gw = P2[c]
        st = _replace_child(st, gw, c, p)
        st = _replace_child(st, p, s, c)
        blen2 = st["blen"].at[p].set(u_split * t_c).at[c].set(
            (1.0 - u_split) * t_c)
        st = {**st, "blen": blen2}
        lnH = (lnq_rev - lnq_fwd
               + jnp.log(jnp.maximum(t_c, 1e-35))
               - jnp.log(jnp.maximum(merged, 1e-35)))
        return st, jnp.where(valid, lnH, NEG_INF)

    move.__name__ = "move_pars_spr"
    return move


def make_pars_tbr_move(pars_masks, pars_factors):
    """Parsimony-biased TBR (reference Move_ParsTBR1,
    src/proposal.c:13224): bisect at an internal node v, re-root the
    pruned subtree on a uniformly chosen internal edge (the uniform
    choice cancels in the Hastings ratio — the subtree's edge count is
    re-rooting-invariant; the reference also parsimony-biases this
    choice, a refinement not carried over), then reattach on the root
    side via the same Fitch-scored softmax as Move_ParsSPR.

    The subtree's Fitch root set depends on its orientation, so the
    forward softmax is scored with the RE-ROOTED subtree set and the
    reverse with the ORIGINAL orientation's set (the reverse move
    re-roots back before scoring)."""
    from ..ops.traversal import postorder_internal

    def fitch(P2, L2, R2, n_tips):
        n_nodes = P2.shape[0]
        F = jnp.zeros((n_nodes, pars_masks.shape[1]), jnp.uint32)
        F = F.at[:n_tips].set(pars_masks)
        order = postorder_internal(P2, n_tips)

        def fstep(F, w):
            a, b = F[L2[w]], F[R2[w]]
            inter = a & b
            return F.at[w].set(jnp.where(inter > 0, inter, a | b)), None

        F, _ = jax.lax.scan(fstep, F, order)
        return F

    def scores(F, Fv, P2, root, warp):
        par_eff = jnp.where(P2 == root, 0, jnp.maximum(P2, 0))
        y = (F | F[par_eff]) & Fv[None, :]
        return warp * jnp.sum(
            jnp.where(y == 0, pars_factors[None, :], 0.0), axis=-1)

    def move(key, state, tuning, n_tips):
        root = 2 * n_tips - 2
        n_nodes = 2 * n_tips - 1
        parent, left, blen = state["parent"], state["left"], state["blen"]
        k1, kc, ku1, k2, k3 = jax.random.split(key, 5)
        idx = jnp.arange(n_nodes)
        basal = left[root]
        # v INTERNAL (a tip subtree cannot re-root: that's plain ParsSPR)
        vmask = (idx >= n_tips) & (idx != root) & (idx != basal)
        v = _masked_choice(k1, vmask)
        p = parent[v]
        g = parent[p]
        s = jnp.where(left[p] == v, state["right"][p], left[p])
        merged = blen[s] + blen[p]
        st = _replace_child(state, g, p, s)
        st = {**st, "blen": st["blen"].at[s].set(merged)}

        # original-orientation Fitch pass (root-side sets + old F[v])
        F_old = fitch(st["parent"], st["left"], st["right"], n_tips)
        Fv_old = F_old[v]

        # crown: uniform new root edge among subtree nodes (not v)
        sub = _subtree_mask(st["parent"], v)
        cmask_sub = sub & (idx != v)
        c_edge = _masked_choice(kc, cmask_sub)
        st, ln_len1 = _reroot_pruned(st, v, c_edge,
                                     jax.random.uniform(ku1))
        F_new = fitch(st["parent"], st["left"], st["right"], n_tips)
        Fv_new = F_new[v]

        P2 = st["parent"]
        d_fwd = scores(F_old, Fv_new, P2, root, tuning)
        d_rev = scores(F_old, Fv_old, P2, root, tuning)
        sub2 = _subtree_mask(P2, v)
        cmask = (~sub2) & (idx != root) & (idx != 0) & (idx != p)
        fwd_mask = cmask & (idx != s)
        valid = jnp.any(fwd_mask)
        fwd_logits = jnp.where(fwd_mask, -d_fwd, NEG_INF)
        w = jnp.where(valid, jax.random.categorical(k2, fwd_logits), s)
        lnq_fwd = fwd_logits[w] - jax.scipy.special.logsumexp(fwd_logits)
        rev_logits = jnp.where(cmask & (idx != w), -d_rev, NEG_INF)
        lnq_rev = rev_logits[s] - jax.scipy.special.logsumexp(rev_logits)

        t_w = st["blen"][w]
        u_split = jax.random.uniform(k3)
        gw = P2[w]
        st = _replace_child(st, gw, w, p)
        st = _replace_child(st, p, s, w)
        blen2 = st["blen"].at[p].set(u_split * t_w).at[w].set(
            (1.0 - u_split) * t_w)
        st = {**st, "blen": blen2}
        lnH = (lnq_rev - lnq_fwd + ln_len1
               + jnp.log(jnp.maximum(t_w, 1e-35))
               - jnp.log(jnp.maximum(merged, 1e-35)))
        return st, jnp.where(valid, lnH, NEG_INF)

    move.__name__ = "move_pars_tbr"
    return move


# ---------------------------------------------------------------------------
# branch-length moves


def move_blen_multiplier(key, state, tuning, n_tips, rooted=False):
    """Multiply one random free branch by exp(lambda(u-1/2))."""
    k1, k2 = jax.random.split(key)
    mask = _free_branch_mask(state, n_tips, rooted)
    v = _masked_choice(k1, mask)
    m = jnp.exp(tuning * (jax.random.uniform(k2) - 0.5))
    new = state["blen"][v] * m
    st = {**state, "blen": state["blen"].at[v].set(new)}
    ok = (new >= BRLEN_MIN) & (new <= BRLEN_MAX)
    return st, jnp.where(ok, jnp.log(m), NEG_INF)


def move_treelen_multiplier(key, state, tuning, n_tips, rooted=False):
    """Scale all free branches; lnH = n_free * log m
    (reference Move_TreeLen src/proposal.c:17136)."""
    mask = _free_branch_mask(state, n_tips, rooted)
    m = jnp.exp(tuning * (jax.random.uniform(key) - 0.5))
    blen = jnp.where(mask, state["blen"] * m, state["blen"])
    n_free = jnp.sum(mask)
    ok = jnp.all(jnp.where(mask, (blen >= BRLEN_MIN) & (blen <= BRLEN_MAX),
                           True))
    st = {**state, "blen": blen}
    return st, jnp.where(ok, n_free * jnp.log(m), NEG_INF)


def move_node_slider(key, state, tuning, n_tips, rooted=False):
    """Pick an internal non-root node; redistribute the two incident branch
    lengths (its own and one child's) keeping the sum, by uniform slide."""
    k1, k2, k3 = jax.random.split(key, 3)
    root = 2 * n_tips - 2
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    if not rooted:
        mask = mask & (idx != state["left"][root])
    v = _masked_choice(k1, mask)
    c = jnp.where(jax.random.bernoulli(k2), state["left"][v],
                  state["right"][v])
    total = state["blen"][v] + state["blen"][c]
    u = jax.random.uniform(k3)
    new_v = u * total
    blen = state["blen"].at[v].set(new_v).at[c].set(total - new_v)
    ok = (new_v >= BRLEN_MIN) & (total - new_v >= BRLEN_MIN)
    return {**state, "blen": blen}, jnp.where(ok, 0.0, NEG_INF)


# ---------------------------------------------------------------------------
# parameter moves (operate on one random row of a grouped parameter)


def _dirichlet_proposal(key, old, conc):
    """Propose new ~ Dirichlet(conc * old); return (new, lnH)."""
    from .priors import dirichlet_lpdf
    alpha_f = jnp.maximum(conc * old, 1e-4)
    g = jax.random.gamma(key, alpha_f) + 1e-10
    new = g / jnp.sum(g, -1, keepdims=True)
    alpha_b = jnp.maximum(conc * new, 1e-4)
    lnH = dirichlet_lpdf(old, alpha_b) - dirichlet_lpdf(new, alpha_f)
    return new, lnH


def make_simplex_move(field, groups: list[int] | None = None):
    """Dirichlet move on one random group row of state[field]
    (reference Move_Statefreqs / Move_Revmat_Dir, src/proposal.c).
    ``groups`` restricts the candidate rows (e.g. nst=mixed rows are
    handled by their own constrained moves)."""
    gidx = None if groups is None else jnp.asarray(groups)

    def move(key, state, tuning, n_tips):
        k1, k2 = jax.random.split(key)
        arr = state[field]
        if arr.ndim == 1:          # the field itself is one simplex
            new, lnH = _dirichlet_proposal(k2, arr, tuning)
            return {**state, field: new}, lnH
        if gidx is None:
            gi = jax.random.randint(k1, (), 0, arr.shape[0])
        else:
            gi = gidx[jax.random.randint(k1, (), 0, gidx.shape[0])]
        new_row, lnH = _dirichlet_proposal(k2, arr[gi], tuning)
        return {**state, field: arr.at[gi].set(new_row)}, lnH
    move.__name__ = f"move_{field}_dirichlet"
    return move


def make_multiplier_move(field, lo, hi):
    """Multiplier move on one random element of a parameter array
    (flattened, so multi-column parameters like the two covarion switch
    rates get per-element updates)."""
    def move(key, state, tuning, n_tips):
        k1, k2 = jax.random.split(key)
        arr = state[field]
        flat = arr.reshape(-1)
        gi = jax.random.randint(k1, (), 0, flat.shape[0])
        m = jnp.exp(tuning * (jax.random.uniform(k2) - 0.5))
        new = flat[gi] * m
        ok = (new >= lo) & (new <= hi)
        return ({**state, field: flat.at[gi].set(new).reshape(arr.shape)},
                jnp.where(ok, jnp.log(m), NEG_INF))
    move.__name__ = f"move_{field}_multiplier"
    return move


def make_slider_move(field, lo, hi):
    """Uniform-window slider with reflection at the bounds."""
    def move(key, state, tuning, n_tips):
        k1, k2 = jax.random.split(key)
        arr = state[field]
        gi = jax.random.randint(k1, (), 0, arr.shape[0])
        delta = (jax.random.uniform(k2) - 0.5) * tuning
        new = arr[gi] + delta
        # reflect into [lo, hi]
        span = hi - lo
        t = jnp.mod(new - lo, 2 * span)
        new = lo + jnp.where(t > span, 2 * span - t, t)
        return {**state, field: arr.at[gi].set(new)}, jnp.float32(0.0)
    move.__name__ = f"move_{field}_slider"
    return move


# ---------------------------------------------------------------------------
# rooted non-clock topology moves (directional substitution models:
# restriction data with statefreqmodel=directional|mixed forces a rooted
# tree with free branch lengths; reference TOPOLOGY_RNCL_* paramIds,
# src/model.c:20126-20134, moved by the standard NNI/SPR machinery)


def move_rooted_nni(key, state, tuning, n_tips):
    """NNI on a rooted tree: swap a random child of a random internal
    non-root node with that node's sibling.  Symmetric (lnH = 0)."""
    root = 2 * n_tips - 2
    parent, left, right = state["parent"], state["left"], state["right"]
    k1, k2 = jax.random.split(key)
    idx = jnp.arange(2 * n_tips - 1)
    mask = (idx >= n_tips) & (idx != root)
    v = _masked_choice(k1, mask)
    p = parent[v]
    s = jnp.where(left[p] == v, right[p], left[p])
    c = jnp.where(jax.random.bernoulli(k2), left[v], right[v])
    st = _replace_child(state, v, c, s)
    st = _replace_child(st, p, s, c)
    return st, jnp.float32(0.0)


def move_rooted_spr(key, state, tuning, n_tips):
    """Rooted SPR: prune the parent edge of a random node v (parent not
    the root), close the gap, and regraft onto a uniformly chosen edge
    anywhere outside v's subtree — including the root's child edges, so
    the root location itself mixes.  lnH = ln(k_f/k_r) + ln(t_w/merged)
    (uniform target choice with topology-dependent candidate counts plus
    the uniform-split length densities)."""
    root = 2 * n_tips - 2
    parent, left, right, blen = (state["parent"], state["left"],
                                 state["right"], state["blen"])
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jnp.arange(2 * n_tips - 1)
    vmask = (idx != root) & (parent != root)
    v = _masked_choice(k1, vmask)
    p = parent[v]
    g = parent[p]
    s = jnp.where(left[p] == v, right[p], left[p])
    merged = blen[s] + blen[p]
    desc = _desc_matrix(parent)

    def wmask_of(desc_m, par, vv, pp):
        return (idx != root) & ~desc_m[vv, :] & (idx != pp)

    wm = wmask_of(desc, parent, v, p)
    k_f = jnp.sum(wm)    # both counts include their identity target
    w = _masked_choice(k2, wm)
    t_w = jnp.where(w == s, merged, blen[w])
    u_split = jax.random.uniform(k3)
    # surgery: close the gap, then insert p above w
    st = _replace_child(state, g, p, s)
    st = {**st, "blen": st["blen"].at[s].set(merged)}
    gw = st["parent"][w]
    st = _replace_child(st, gw, w, p)
    st = _replace_child(st, p, s, w)
    blen2 = st["blen"].at[p].set(u_split * t_w).at[w].set(
        (1.0 - u_split) * t_w)
    st = {**st, "blen": blen2}
    desc2 = _desc_matrix(st["parent"])
    k_r = jnp.sum(wmask_of(desc2, st["parent"], v, p))
    lnH = (jnp.log(jnp.maximum(k_f, 1).astype(jnp.float32))
           - jnp.log(jnp.maximum(k_r, 1).astype(jnp.float32))
           + jnp.log(jnp.maximum(t_w, 1e-35))
           - jnp.log(jnp.maximum(merged, 1e-35)))
    ok = (jnp.sum(vmask) > 0) & (jnp.sum(wm) > 0) & (w != v)
    return st, jnp.where(ok, lnH, NEG_INF)
