"""Binary Coulomb collisions (Perez/Nanbu), cell-paired, vectorized.

Reimplements the reference's relativistic elastic Coulomb collision module
(Source/Particles/Collision/BinaryCollision/Coulomb/
UpdateMomentumPerezElastic.H and ElasticCollisionPerez.H): particles are
randomly paired within cells (the bin-sort + Fisher-Yates shuffle becomes a
sort by (cell, random) key), each pair scatters in the center-of-momentum
frame by the Nanbu cumulative angle with s12 from Perez Eq. 9 (with the
sigma_max cap and Debye/atomic-spacing screening), and the per-particle
updates are accepted with the weight-ratio rejection rule.

Intra-species pairing uses n12 = wmax*(N_cell-1)/dV (same-species branch of
ElasticCollisionPerez.H:133); inter-species pairing iterates the LARGER set
once, striding the smaller set (ElasticCollisionPerez.H:103-146) with
n12 = wmax*min_N/dV and the combined two-species Debye length — realized
here as sequential "rounds" (larger-set rank // min_N) so each round is a
conflict-free vectorized scatter.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants

__all__ = ["intra_species_coulomb", "inter_species_coulomb"]

_inv_c2 = constants.inv_c2


def _perez_update(u1, u2, q1, m1, w1, q2, m2, w2, n12, sigma_max, L, bmax,
                  dt, r1, r2, r3, r4, r5):
    """Vectorized UpdateMomentumPerezElastic over pair arrays.

    u1,u2: tuples (ux,uy,uz).  r1..r5: uniform(0,1) draws per pair.
    Returns (u1_new, u2_new).
    """
    u1x, u1y, u1z = u1
    u2x, u2y, u2z = u2
    gb1sq = (u1x**2 + u1y**2 + u1z**2) * _inv_c2
    gb2sq = (u2x**2 + u2y**2 + u2z**2) * _inv_c2
    g1 = jnp.sqrt(1.0 + gb1sq)
    g2 = jnp.sqrt(1.0 + gb2sq)
    diffm = jnp.sqrt(
        ((u1x - u2x) ** 2 + (u1y - u2y) ** 2 + (u1z - u2z) ** 2) * _inv_c2
    )
    summm = jnp.sqrt(gb1sq) + jnp.sqrt(gb2sq)
    live = (diffm > 0.0) & (diffm > 1.0e-10 * summm)

    p1x, p1y, p1z = u1x * m1, u1y * m1, u1z * m1
    p2x, p2y, p2z = u2x * m2, u2y * m2, u2z * m2
    mass_g = m1 * g1 + m2 * g2
    vcx = (p1x + p2x) / mass_g
    vcy = (p1y + p2y) / mass_g
    vcz = (p1z + p2z) / mass_g
    vcms = vcx**2 + vcy**2 + vcz**2
    gc = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vcms * _inv_c2, 1e-30))

    vcDv1 = (vcx * u1x + vcy * u1y + vcz * u1z) / g1
    vcDv2 = (vcx * u2x + vcy * u2y + vcz * u2z) / g2
    ltf = (gc * gc * vcDv1 * _inv_c2 / (1.0 + gc) - gc) * m1 * g1
    p1sx = p1x + vcx * ltf
    p1sy = p1y + vcy * ltf
    p1sz = p1z + vcz * ltf
    p1sm = jnp.sqrt(p1sx**2 + p1sy**2 + p1sz**2)
    g1s = (1.0 - vcDv1 * _inv_c2) * gc * g1
    g2s = (1.0 - vcDv2 * _inv_c2) * gc * g2

    muRst = g1s * m1 * g2s * m2 / (g1s * m1 + g2s * m2)
    p1sm_safe = jnp.where(p1sm > 0, p1sm, 1.0)
    vrelst = p1sm_safe / muRst
    denom = 1.0 + p1sm_safe**2 / (m1 * g1s * m2 * g2s) * _inv_c2
    vrelst_invar = vrelst / denom

    b0 = jnp.abs(q1 * q2) / (
        2.0 * math.pi * constants.ep0 * muRst * vrelst * vrelst_invar
    )
    bmin_qm = constants.hbar * 0.5 / p1sm_safe
    bmin = jnp.maximum(bmin_qm, 0.5 * b0)
    lnLmd = jnp.where(
        L > 0.0,
        L,
        jnp.maximum(2.0, 0.5 * jnp.log(1.0 + bmax**2 / bmin**2)),
    )
    sigma_eff = jnp.minimum(math.pi * b0**2 * lnLmd, sigma_max)
    s12 = jnp.where(
        p1sm > 0.0,
        sigma_eff * n12 * dt * vrelst * g1s * g2s / (g1 * g2),
        0.0,
    )
    live = live & (s12 > 0.0)

    # scattering angle from the Nanbu cumulative distribution
    r = r1
    # s <= 0.1 branch with one redraw to dodge cosXs < -1
    cos_a = 1.0 + s12 * jnp.log(jnp.maximum(r, 1e-300))
    cos_a = jnp.where(cos_a < -1.0, 1.0 + s12 * jnp.log(jnp.maximum(r2, 1e-300)), cos_a)
    cos_a = jnp.clip(cos_a, -1.0, 1.0)
    s = s12
    Ainv = (
        0.0056958 + 0.9560202 * s - 0.508139 * s**2
        + 0.47913906 * s**3 - 0.12788975 * s**4 + 0.02389567 * s**5
    )
    cos_b = Ainv * jnp.log(
        jnp.exp(-1.0 / jnp.where(Ainv != 0, Ainv, 1.0))
        + 2.0 * r * jnp.sinh(1.0 / jnp.where(Ainv != 0, Ainv, 1.0))
    )
    A = 3.0 * jnp.exp(-s)
    A_safe = jnp.where(A > 0, A, 1.0)
    cos_c = (1.0 / A_safe) * jnp.log(jnp.exp(-A) + 2.0 * r * jnp.sinh(A))
    cos_d = 2.0 * r - 1.0
    cosXs = jnp.where(
        s12 <= 0.1, cos_a,
        jnp.where(s12 <= 3.0, cos_b, jnp.where(s12 <= 6.0, cos_c, cos_d)),
    )
    cosXs = jnp.clip(cosXs, -1.0, 1.0)
    sinXs = jnp.sqrt(1.0 - cosXs * cosXs)
    phis = r3 * 2.0 * math.pi
    cosphis = jnp.cos(phis)
    sinphis = jnp.sin(phis)

    # post-collision COM momenta: rotate p1s (Perez Eq. 12 with the
    # degenerate-perpendicular fallback)
    p1sp = jnp.sqrt(p1sx**2 + p1sy**2)
    use_main = p1sp > 1e-300
    p1sp_s = jnp.where(use_main, p1sp, 1.0)
    fx = (p1sx * p1sz / p1sp_s) * sinXs * cosphis + (
        p1sy * p1sm / p1sp_s
    ) * sinXs * sinphis + p1sx * cosXs
    fy = (p1sy * p1sz / p1sp_s) * sinXs * cosphis + (
        -p1sx * p1sm / p1sp_s
    ) * sinXs * sinphis + p1sy * cosXs
    fz = (-p1sp_s) * sinXs * cosphis + p1sz * cosXs
    # fallback with x->y->z->x
    p1sp2 = jnp.sqrt(p1sy**2 + p1sz**2)
    p1sp2_s = jnp.where(p1sp2 > 0, p1sp2, 1.0)
    gy = (p1sy * p1sx / p1sp2_s) * sinXs * cosphis + (
        p1sz * p1sm / p1sp2_s
    ) * sinXs * sinphis + p1sy * cosXs
    gz = (p1sz * p1sx / p1sp2_s) * sinXs * cosphis + (
        -p1sy * p1sm / p1sp2_s
    ) * sinXs * sinphis + p1sz * cosXs
    gx = (-p1sp2_s) * sinXs * cosphis + p1sx * cosXs
    p1fsx = jnp.where(use_main, fx, gx)
    p1fsy = jnp.where(use_main, fy, gy)
    p1fsz = jnp.where(use_main, fz, gz)

    # back to the lab frame
    factor = gc * gc * _inv_c2 / (gc + 1.0)
    vcDp1fs = vcx * p1fsx + vcy * p1fsy + vcz * p1fsz
    factor1 = factor * vcDp1fs + m1 * g1s * gc
    factor2 = factor * (-vcDp1fs) + m2 * g2s * gc
    p1fx = p1fsx + vcx * factor1
    p1fy = p1fsy + vcy * factor1
    p1fz = p1fsz + vcz * factor1
    p2fx = -p1fsx + vcx * factor2
    p2fy = -p1fsy + vcy * factor2
    p2fz = -p1fsz + vcz * factor2

    wmax = jnp.maximum(w1, w2)
    take1 = live & (w2 > r4 * wmax)
    take2 = live & (w1 > r5 * wmax)
    u1n = (
        jnp.where(take1, p1fx / m1, u1x),
        jnp.where(take1, p1fy / m1, u1y),
        jnp.where(take1, p1fz / m1, u1z),
    )
    u2n = (
        jnp.where(take2, p2fx / m2, u2x),
        jnp.where(take2, p2fy / m2, u2y),
        jnp.where(take2, p2fz / m2, u2z),
    )
    return u1n, u2n


def _cell_of(sp_state, geom, n_cells_tot):
    """Flat cell index per particle; dead particles parked at n_cells_tot."""
    ndim = geom.ndim
    pos = sp_state.positions(ndim)
    cell = jnp.zeros(sp_state.capacity, jnp.int32)
    for d in range(ndim):
        idx = jnp.floor(
            (pos[d] - geom.prob_lo[d]) / geom.dx[d]
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, geom.n_cell[d] - 1)
        cell = cell * geom.n_cell[d] + idx
    return jnp.where(sp_state.alive, cell, n_cells_tot)


def _cell_moments(sp_state, m, cell, n_cells_tot, dV):
    """Per-cell (count, density, temperature[J]) including a dead slot.

    Density n = sum(w)/dV; T from the proper-velocity variance
    (reference: ComputeTemperature.H).
    """
    w = jnp.where(sp_state.alive, sp_state.w, 0.0)
    wsum = jnp.zeros(n_cells_tot + 1, w.dtype).at[cell].add(w)
    nsum = jnp.zeros(n_cells_tot + 1, w.dtype).at[cell].add(
        sp_state.alive.astype(w.dtype)
    )
    nsafe = jnp.maximum(nsum, 1.0)
    var = jnp.zeros(n_cells_tot + 1, w.dtype)
    for u in (sp_state.ux, sp_state.uy, sp_state.uz):
        s = jnp.zeros(n_cells_tot + 1, w.dtype).at[cell].add(
            jnp.where(sp_state.alive, u, 0.0)
        )
        mu = s / nsafe
        var = var.at[cell].add(
            jnp.where(sp_state.alive, (u - mu[cell]) ** 2, 0.0)
        )
    T = jnp.maximum((m / 3.0) * var / nsafe, 1e-300)
    return nsum, wsum / dV, T


def inter_species_coulomb(
    sp1, q1: float, m1: float, sp2, q2: float, m2: float,
    geom, dt: float, rng_key, coulomb_log: float = -1.0,
):
    """One inter-species Coulomb collision step between two species.

    The reference strides the smaller per-cell set while walking the larger
    set once (ElasticCollisionPerez.H:103-146).  Here every larger-set
    particle gets a fixed partner (its in-cell rank mod min_N) and the
    sequential reuse of a smaller-set particle becomes "rounds"
    (rank // min_N), applied one after another under lax.while_loop so each
    round's scatters are conflict-free.  Returns (sp1', sp2', key).
    """
    n_cells_tot = 1
    for d in range(geom.ndim):
        n_cells_tot *= geom.n_cell[d]
    dV = geom.cell_volume

    cell1 = _cell_of(sp1, geom, n_cells_tot)
    cell2 = _cell_of(sp2, geom, n_cells_tot)
    key, k_s1, k_s2, k_p1, k_p2 = jax.random.split(rng_key, 5)
    order1 = jnp.lexsort((jax.random.uniform(k_s1, (sp1.capacity,)), cell1))
    order2 = jnp.lexsort((jax.random.uniform(k_s2, (sp2.capacity,)), cell2))

    N1, n1, T1 = _cell_moments(sp1, m1, cell1, n_cells_tot, dV)
    N2, n2, T2 = _cell_moments(sp2, m2, cell2, n_cells_tot, dV)
    # exclusive prefix of per-cell counts = start of each cell's block in the
    # (cell, random)-sorted order
    start1 = jnp.concatenate([jnp.zeros(1, N1.dtype), jnp.cumsum(N1)[:-1]])
    start2 = jnp.concatenate([jnp.zeros(1, N2.dtype), jnp.cumsum(N2)[:-1]])

    # combined Debye length & atomic spacing (ElasticCollisionPerez.H:74-90)
    if coulomb_log > 0.0:
        lmdD = jnp.ones(n_cells_tot + 1)
    else:
        lmdD = 1.0 / jnp.sqrt(jnp.maximum(
            n1 * q1 * q1 / (T1 * constants.ep0)
            + n2 * q2 * q2 / (T2 * constants.ep0),
            1e-300,
        ))
    maxn = jnp.maximum(jnp.maximum(n1, n2), 1e-300)
    rmin = 1.0 / jnp.cbrt(4.0 * math.pi / 3.0 * maxn)
    bmax_c = jnp.maximum(lmdD, rmin)
    sigma_max_c = 1.0 / (maxn * rmin)
    minN = jnp.minimum(N1, N2)

    mom1 = (sp1.ux, sp1.uy, sp1.uz)
    mom2 = (sp2.ux, sp2.uy, sp2.uz)

    def one_pass(momL, momS, spL, spS, qL, mL, qS, mS,
                 orderL, cellL, startL, startS, orderS, cell_mask, pkey):
        """Walk species L (the larger set in the masked cells), colliding
        each alive L-particle with its strided S partner, round by round."""
        capL = spL.capacity
        j = jnp.arange(capL)
        origL = orderL
        cL = cellL[orderL]
        rank = j - startL[cL].astype(j.dtype)
        mN = minN[cL]
        active = (cL < n_cells_tot) & spL.alive[orderL] & (mN > 0) & cell_mask[cL]
        mN_s = jnp.maximum(mN, 1.0).astype(j.dtype)
        partner_slot = jnp.clip(
            startS[cL].astype(j.dtype) + rank % mN_s, 0, spS.capacity - 1
        )
        origS = orderS[partner_slot]
        rounds = jnp.where(active, rank // mN_s, -1)
        n_rounds = jnp.max(rounds) + 1

        wL = spL.w[origL]
        wS = spS.w[origS]
        n12 = jnp.maximum(wL, wS) * minN[cL].astype(wL.dtype) / dV
        sig = sigma_max_c[cL]
        bmx = bmax_c[cL]

        def body(carry):
            (uLx, uLy, uLz), (uSx, uSy, uSz), r = carry
            mask = active & (rounds == r)
            rk = jax.random.fold_in(pkey, r)
            draws = jax.random.uniform(rk, (5, capL))
            uL = (uLx[origL], uLy[origL], uLz[origL])
            uS = (uSx[origS], uSy[origS], uSz[origS])
            uLn, uSn = _perez_update(
                uL, uS, qL, mL, wL, qS, mS, wS,
                jnp.where(mask, n12, 0.0), sig, coulomb_log, bmx,
                dt, *draws,
            )
            uLx = uLx.at[origL].set(jnp.where(mask, uLn[0], uL[0]))
            uLy = uLy.at[origL].set(jnp.where(mask, uLn[1], uL[1]))
            uLz = uLz.at[origL].set(jnp.where(mask, uLn[2], uL[2]))
            uSx = uSx.at[origS].set(jnp.where(mask, uSn[0], uS[0]))
            uSy = uSy.at[origS].set(jnp.where(mask, uSn[1], uS[1]))
            uSz = uSz.at[origS].set(jnp.where(mask, uSn[2], uS[2]))
            return (uLx, uLy, uLz), (uSx, uSy, uSz), r + 1

        def cond(carry):
            return carry[2] < n_rounds

        momL2, momS2, _ = jax.lax.while_loop(
            cond, body, (momL, momS, jnp.asarray(0, rounds.dtype))
        )
        return momL2, momS2

    # pass 1: cells where species 1 is the larger (or equal) set
    mom1, mom2 = one_pass(
        mom1, mom2, sp1, sp2, q1, m1, q2, m2,
        order1, cell1, start1, start2, order2, N1 >= N2, k_p1,
    )
    # pass 2: cells where species 2 is strictly larger
    mom2, mom1 = one_pass(
        mom2, mom1, sp2, sp1, q2, m2, q1, m1,
        order2, cell2, start2, start1, order1, N2 > N1, k_p2,
    )
    sp1 = sp1.replace(ux=mom1[0], uy=mom1[1], uz=mom1[2])
    sp2 = sp2.replace(ux=mom2[0], uy=mom2[1], uz=mom2[2])
    return sp1, sp2, key


def intra_species_coulomb(
    sp_state, q: float, m: float, geom, dt: float, rng_key,
    coulomb_log: float = -1.0,
):
    """One intra-species Coulomb collision step.

    Pairs particles randomly within cells and applies the Perez update.
    Returns (new_state, new_key).
    """
    ndim = geom.ndim
    cap = sp_state.capacity
    pos = sp_state.positions(ndim)
    cell = jnp.zeros(cap, jnp.int32)
    n_cells_tot = 1
    for d in range(ndim):
        idx = jnp.floor(
            (pos[d] - geom.prob_lo[d]) / geom.dx[d]
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, geom.n_cell[d] - 1)
        cell = cell * geom.n_cell[d] + idx
        n_cells_tot *= geom.n_cell[d]
    cell = jnp.where(sp_state.alive, cell, n_cells_tot)  # dead last

    key, k_shuf, k1, k2, k3, k4, k5 = jax.random.split(rng_key, 7)
    shuf = jax.random.uniform(k_shuf, (cap,))
    # sort by (cell, random): random pairing within each cell
    order = jnp.lexsort((shuf, cell))
    cell_s = cell[order]

    dV = geom.cell_volume
    w = jnp.where(sp_state.alive, sp_state.w, 0.0)
    # per-cell density and temperature (ElasticCollisionPerez.H:70-90;
    # T from the proper-velocity variance, ComputeTemperature.H)
    wsum = jnp.zeros(n_cells_tot + 1).at[cell].add(w)
    nsum = jnp.zeros(n_cells_tot + 1).at[cell].add(
        sp_state.alive.astype(w.dtype)
    )
    n_cell_dens = wsum / dV
    nsafe = jnp.maximum(nsum, 1.0)
    mean_u = []
    for u in (sp_state.ux, sp_state.uy, sp_state.uz):
        s = jnp.zeros(n_cells_tot + 1).at[cell].add(jnp.where(sp_state.alive, u, 0.0))
        mean_u.append(s / nsafe)
    var = jnp.zeros(n_cells_tot + 1)
    for u, mu in zip((sp_state.ux, sp_state.uy, sp_state.uz), mean_u):
        var = var.at[cell].add(
            jnp.where(sp_state.alive, (u - mu[cell]) ** 2, 0.0)
        )
    T_cell = (m / 3.0) * var / nsafe  # Joules
    T_cell = jnp.maximum(T_cell, 1e-300)

    # pair arrays: (cap//2, 2) of sorted slots
    npairs = cap // 2
    i1 = order[0 : 2 * npairs : 2]
    i2 = order[1 : 2 * npairs : 2]
    same_cell = (cell_s[0 : 2 * npairs : 2] == cell_s[1 : 2 * npairs : 2]) & (
        cell_s[0 : 2 * npairs : 2] < n_cells_tot
    )
    c_pair = jnp.minimum(cell_s[0 : 2 * npairs : 2], n_cells_tot)

    n_loc = n_cell_dens[c_pair]
    T_loc = T_cell[c_pair]
    N_loc = nsum[c_pair]
    lmdD = jnp.where(
        coulomb_log > 0.0,
        1.0,
        1.0 / jnp.sqrt(
            jnp.maximum(2.0 * n_loc * q * q / (T_loc * constants.ep0), 1e-300)
        ),
    )
    maxn = jnp.maximum(n_loc, 1e-300)
    rmin = 1.0 / jnp.cbrt(4.0 * math.pi / 3.0 * maxn)
    bmax = jnp.maximum(lmdD, rmin)
    sigma_max = 1.0 / (maxn * rmin)
    w1 = sp_state.w[i1]
    w2 = sp_state.w[i2]
    wpmax = jnp.maximum(w1, w2)
    n12 = wpmax * jnp.maximum(N_loc - 1.0, 0.0) / dV

    u1 = (sp_state.ux[i1], sp_state.uy[i1], sp_state.uz[i1])
    u2 = (sp_state.ux[i2], sp_state.uy[i2], sp_state.uz[i2])
    draws = [jax.random.uniform(k, (npairs,)) for k in (k1, k2, k3, k4, k5)]
    u1n, u2n = _perez_update(
        u1, u2, q, m, w1, q, m, w2,
        jnp.where(same_cell, n12, 0.0), sigma_max, coulomb_log, bmax,
        dt, *draws,
    )

    def scat(base, idx, vals, old):
        return base.at[idx].set(jnp.where(same_cell, vals, old))

    ux = scat(sp_state.ux, i1, u1n[0], u1[0])
    uy = scat(sp_state.uy, i1, u1n[1], u1[1])
    uz = scat(sp_state.uz, i1, u1n[2], u1[2])
    ux = scat(ux, i2, u2n[0], u2[0])
    uy = scat(uy, i2, u2n[1], u2[1])
    uz = scat(uz, i2, u2n[2], u2[2])
    return sp_state.replace(ux=ux, uy=uy, uz=uz), key
