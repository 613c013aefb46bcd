"""Nuclear fusion binary collisions (proton-boron, D-T, D-D).

Reimplements the reference's NuclearFusion collision module
(Source/Particles/Collision/BinaryCollision/NuclearFusion/):

* pair fusion probability from the Higginson et al. JCP 388, 439 (2019)
  algorithm (SingleNuclearFusionEvent.H): relativistic COM kinetic energy /
  relative velocity (BinaryCollisionUtils.H:50-133), cross section, fusion
  multiplier with the probability-threshold reduction;
* cross sections: Bosch-Hale 1992 fits for D-T / D-D (+D-He3)
  (BoschHaleFusionCrossSection.H), Tentori-Belloni 2023 + Buck 1983 fits
  for p-B11 (ProtonBoronFusionCrossSection.H);
* product momenta: exact two-body COM kinematics with isotropic emission
  (TwoProductFusionUtil.H), and the two-step p+B11 -> alpha + Be8* ->
  3 alphas channel (ProtonBoronFusionInitializeMomentum.H);
* products are created at both parent positions with half the reaction
  weight each, and the reaction weight is subtracted from the reactants
  (ParticleCreationFunc.H:187-191).

All pair machinery follows the per-cell stride pairing of ops/collisions.py
(ShuffleFisherYates analog: random in-cell order, larger set walks the
smaller set).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import constants

__all__ = [
    "bosch_hale_cross_section", "proton_boron_cross_section",
    "collision_parameters", "fusion_collision_update", "FUSION_TYPES",
]

_c = constants.c
_c2 = _c * _c
_q_e = constants.q_e
_m_u = 1.66053906660e-27  # unified atomic mass (ablastr constant::SI::m_u)

# fusion type -> (E_fusion [J] for product kinematics)
FUSION_TYPES = ("protonboron", "dt", "ddp", "ddn", "dhe")
_E_FUSION = {
    "dt": 17.5893e6 * _q_e,
    "ddp": 4.032667e6 * _q_e,
    "ddn": 3.268911e6 * _q_e,
}

# Bosch-Hale table IV coefficients (Nucl. Fusion 32, 611 (1992), Eq. 8-9)
_BH = {
    "dt": ((6.927e4, 7.454e8, 2.050e6, 5.2002e4, 0.0),
           (6.38e1, -9.95e-1, 6.981e-5, 1.728e-4)),
    "ddp": ((5.5576e4, 2.1054e2, -3.2638e-2, 1.4987e-6, 1.8181e-10),
            (0.0, 0.0, 0.0, 0.0)),
    "ddn": ((5.3701e4, 3.3027e2, -1.2706e-1, 2.9327e-5, -2.5151e-9),
            (0.0, 0.0, 0.0, 0.0)),
    "dhe": ((5.7501e6, 2.5226e3, 4.5566e1, 0.0, 0.0),
            (-3.1995e-3, -8.5530e-6, 5.9014e-8, 0.0)),
}


def bosch_hale_cross_section(E_kin, kind, m1, m2):
    """sigma(E_COM) [m^2] from the Bosch-Hale 1992 astrophysical-factor fits
    (BoschHaleFusionCrossSection.H)."""
    joule_to_keV = 1e-3 / _q_e
    E_keV = E_kin * joule_to_keV
    m_reduced = m1 / (1.0 + m1 / m2)
    alpha_fs = 7.2973525693e-3  # fine-structure constant (PhysConst::alpha)
    B_G = math.pi * alpha_fs * jnp.sqrt(2.0 * m_reduced * _c2 * joule_to_keV)
    if kind == "dhe":
        B_G = B_G * 2.0  # Z=2 reactant
    (A1, A2, A3, A4, A5), (B1, B2, B3, B4) = _BH[kind]
    S = (A1 + E_keV * (A2 + E_keV * (A3 + E_keV * (A4 + E_keV * A5)))) / (
        1.0 + E_keV * (B1 + E_keV * (B2 + E_keV * (B3 + E_keV * B4)))
    )
    safe = jnp.maximum(E_keV, 1e-300)
    sigma = 1e-31 * S / safe * jnp.exp(-B_G / jnp.sqrt(safe))
    return jnp.where(E_keV > 0.0, sigma, 0.0)


def proton_boron_cross_section(E_kin):
    """sigma(E_COM) [m^2]: Tentori-Belloni 2023 fit (with the 148 keV
    Breit-Wigner resonance) below 9.76 MeV, Buck 1983 power law above
    (ProtonBoronFusionCrossSection.H)."""
    joule_to_keV = 1e-3 / _q_e
    E_keV = jnp.maximum(E_kin * joule_to_keV, 1e-300)
    E_MeV = E_keV * 1e-3

    # Gamow factor in MeV (Z_boron = 5)
    m_boron = 11.00930536 * _m_u
    m_h = 1.00782503223 * _m_u
    m_red = m_boron / (1.0 + m_boron / m_h)
    hbar = 1.054571817e-34
    g = (m_red / 2.0) * (_q_e * _q_e * 5.0 / (2.0 * constants.ep0 * hbar)) ** 2
    gamow_MeV = g * (1e-6 / _q_e)

    # astrophysical factor [MeV barn], three fit regions
    sf_low = (
        197.0 + 0.269 * E_keV + 2.54e-4 * E_keV**2
        + 1.82e4 / ((E_keV - 148.0) ** 2 + 2.35**2)
    )
    E_norm = (E_keV - 400.0) * 1e-2
    sf_mid = 346.0 + 150.0 * E_norm - 59.9 * E_norm**2 - 0.460 * E_norm**5
    sf_high = (
        1.98e6 / ((E_keV - 640.9) ** 2 + 85.5**2)
        + 3.89e6 / ((E_keV - 1211.0) ** 2 + 414.0**2)
        + 1.36e6 / ((E_keV - 2340.0) ** 2 + 221.0**2)
        + 3.71e6 / ((E_keV - 3294.0) ** 2 + 351.0**2)
        + 0.381
    )
    sf = jnp.where(E_keV < 400.0, sf_low,
                   jnp.where(E_keV < 668.0, sf_mid, sf_high))
    sigma_tentori = sf / E_MeV * jnp.exp(-jnp.sqrt(gamow_MeV / E_MeV))

    # Buck power-law fit above 9.76 MeV
    sigma_buck = 0.01277998 * (E_keV / 9760.0) ** (-2.661840717596765)

    sigma_b = jnp.where(E_keV <= 9760.0, sigma_tentori, sigma_buck)
    return jnp.where(E_kin > 0.0, sigma_b * 1e-28, 0.0)


def collision_parameters(u1, u2, m1, m2):
    """(E_kin_COM, v_rel_COM, lab_to_COM_factor) for pair momenta u1, u2
    (proper velocities, m/s) — BinaryCollisionUtils::get_collision_parameters."""
    g1 = jnp.sqrt(1.0 + (u1[0] ** 2 + u1[1] ** 2 + u1[2] ** 2) / _c2)
    g2 = jnp.sqrt(1.0 + (u2[0] ** 2 + u2[1] ** 2 + u2[2] ** 2) / _c2)
    p_tot_sq = sum((m1 * a + m2 * b) ** 2 for a, b in zip(u1, u2))
    E_lab = (m1 * g1 + m2 * g2) * _c2
    E_star_sq = E_lab * E_lab - _c2 * p_tot_sq
    E_star = jnp.sqrt(jnp.maximum(E_star_sq, 0.0))
    E_kin = E_star - (m1 + m2) * _c2
    E_ratio = E_star / ((m1 + m2) * _c2)
    p_star_sq = m1 * m2 * _c2 * (E_ratio**2 - 1.0) + (m1 - m2) ** 2 * _c2 / 4.0 * (
        E_ratio - 1.0 / E_ratio
    ) ** 2
    p_star_sq = jnp.maximum(p_star_sq, 0.0)
    g1s = jnp.sqrt(1.0 + p_star_sq / (m1 * m1 * _c2))
    g2s = jnp.sqrt(1.0 + p_star_sq / (m2 * m2 * _c2))
    v_rel = jnp.sqrt(p_star_sq) * (1.0 / (m1 * g1s) + 1.0 / (m2 * g2s))
    lab_to_com = g1s * g2s / (g1 * g2)
    return E_kin, v_rel, lab_to_com


def _isotropic(key, norm):
    """Random 3-vector of given norm (ParticleUtils::RandomizeVelocity)."""
    k1, k2 = jax.random.split(key)
    mu = jax.random.uniform(k1, norm.shape, norm.dtype, -1.0, 1.0)
    phi = jax.random.uniform(k2, norm.shape, norm.dtype, 0.0, 2.0 * math.pi)
    s = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    return norm * s * jnp.cos(phi), norm * s * jnp.sin(phi), norm * mu


def _boost_from_com(p_star3, vc3, m_out, p_star_sq):
    """COM momentum -> lab momentum, eq. (13) of Perez et al. PoP 19, 083104
    (TwoProductFusionUtil.H:120-140)."""
    vc_sq = vc3[0] ** 2 + vc3[1] ** 2 + vc3[2] ** 2
    safe_vc = jnp.maximum(vc_sq, 1e-300)
    gc = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vc_sq / _c2, 1e-300))
    g_star = jnp.sqrt(1.0 + p_star_sq / (m_out * m_out * _c2))
    vcDps = sum(v * p for v, p in zip(vc3, p_star3))
    factor = (gc - 1.0) / safe_vc * vcDps + m_out * g_star * gc
    boosted = tuple(p + v * factor for p, v in zip(p_star3, vc3))
    return tuple(
        jnp.where(vc_sq > 1e-280, b, p) for b, p in zip(boosted, p_star3)
    )


def two_product_momenta(key, u1, m1, u2, m2, m1_out, m2_out, E_fusion):
    """Product proper velocities (u1_out3, u2_out3) for a 2-product fusion
    (TwoProductFusionUtil.H TwoProductFusionComputeProductMomenta)."""
    g1 = jnp.sqrt(1.0 + (u1[0] ** 2 + u1[1] ** 2 + u1[2] ** 2) / _c2)
    g2 = jnp.sqrt(1.0 + (u2[0] ** 2 + u2[1] ** 2 + u2[2] ** 2) / _c2)
    p_in3 = tuple(m1 * a + m2 * b for a, b in zip(u1, u2))
    E_rest_in = (m1 + m2) * _c2
    E_rest_out = (m1_out + m2_out) * _c2
    E_lab = (m1 * g1 + m2 * g2) * _c2
    E_star = jnp.sqrt(jnp.maximum(
        E_lab * E_lab - _c2 * sum(p * p for p in p_in3), 0.0))
    E_star_f = E_star - E_rest_in + E_rest_out + E_fusion
    E_ratio = E_star_f / ((m1_out + m2_out) * _c2)
    p_star_sq = m1_out * m2_out * _c2 * (E_ratio**2 - 1.0) + (
        m1_out - m2_out
    ) ** 2 * _c2 * 0.25 * (E_ratio - 1.0 / E_ratio) ** 2
    p_star_sq = jnp.maximum(p_star_sq, 0.0)
    p_star3 = _isotropic(key, jnp.sqrt(p_star_sq))
    mass_g = m1 * g1 + m2 * g2
    vc3 = tuple(p / mass_g for p in p_in3)
    p1_out3 = _boost_from_com(p_star3, vc3, m1_out, p_star_sq)
    p2_out3 = tuple(pi - p1 for pi, p1 in zip(p_in3, p1_out3))
    return (
        tuple(p / m1_out for p in p1_out3),
        tuple(p / m2_out for p in p2_out3),
    )


# p-B11 channel constants (ProtonBoronFusionInitializeMomentum.H:79-92)
M_ALPHA = _m_u * 4.00260325413
_M_BE = _m_u * (8.0053095729 + 0.00325283863)  # Be8 excited state
_E_FUSION_PB = 5.55610759e6 * _q_e
_E_DECAY_PB = 3.12600414e6 * _q_e


def proton_boron_momenta(key, u1, m1, u2, m2):
    """Proper velocities of the 3 alphas from p+B11 -> alpha + Be8* ->
    3 alpha (two-step, isotropic in each rest frame)."""
    k1, k2 = jax.random.split(key)
    u_alpha1, u_Be = two_product_momenta(
        k1, u1, m1, u2, m2, M_ALPHA, _M_BE, _E_FUSION_PB
    )
    p_Be3 = tuple(_M_BE * u for u in u_Be)
    # alpha 2: isotropic in the Be rest frame with half the decay energy
    gamma_Bestar = 1.0 + 0.5 * _E_DECAY_PB / (M_ALPHA * _c2)
    p_Bestar = M_ALPHA * _c * math.sqrt(gamma_Bestar**2 - 1.0)
    shape_arr = u_Be[0]
    p_star3 = _isotropic(k2, jnp.full_like(shape_arr, p_Bestar))
    p_Be_sq = sum(p * p for p in p_Be3)
    g_Be = jnp.sqrt(1.0 + p_Be_sq / (_M_BE * _M_BE * _c2))
    v_Be3 = tuple(p / (_M_BE * g_Be) for p in p_Be3)
    v_Be_sq = sum(v * v for v in v_Be3)
    vcDps = sum(v * p for v, p in zip(v_Be3, p_star3))
    factor = (g_Be - 1.0) / jnp.maximum(v_Be_sq, 1e-300) * vcDps \
        + M_ALPHA * gamma_Bestar * g_Be
    p_a2 = tuple(
        jnp.where(v_Be_sq > 1e-280, p + v * factor, p)
        for p, v in zip(p_star3, v_Be3)
    )
    p_a3 = tuple(pb - pa for pb, pa in zip(p_Be3, p_a2))
    return (
        u_alpha1,
        tuple(p / M_ALPHA for p in p_a2),
        tuple(p / M_ALPHA for p in p_a3),
    )


def fusion_event_weight(
    key, u1, m1, w1, u2, m2, w2, kind, dt, dV,
    fusion_multiplier, multiplier_ratio, prob_threshold, prob_target,
):
    """(fuse_mask, reaction_weight) per pair (SingleNuclearFusionEvent.H)."""
    E_kin, v_rel, lab_to_com = collision_parameters(u1, u2, m1, m2)
    if kind == "protonboron":
        sigma = proton_boron_cross_section(E_kin)
    else:
        sigma = bosch_hale_cross_section(E_kin, kind, m1, m2)
    w_min = jnp.minimum(w1, w2)
    w_max = jnp.maximum(w1, w2)
    prob_est = (
        multiplier_ratio * fusion_multiplier * lab_to_com
        * w_max * sigma * v_rel * dt / dV
    )
    mult_eff = jnp.where(
        prob_est > prob_threshold,
        jnp.maximum(fusion_multiplier * prob_target
                    / jnp.maximum(prob_est, 1e-300), 1.0),
        fusion_multiplier,
    )
    prob_est = prob_est * mult_eff / fusion_multiplier
    prob = -jnp.expm1(-prob_est)
    r = jax.random.uniform(key, prob.shape, prob.dtype)
    fuse = r < prob
    return fuse, jnp.where(fuse, w_min / mult_eff, 0.0)


def _pairs_for(sp, geom, key, intra):
    """Per-cell pairing arrays: (idxL, idxS, multiplier_ratio, valid).

    Inter-species: call once per species to get (cell, random)-sorted order;
    the caller combines two species.  This helper returns the sorted order
    and per-cell (start, count) tables (BinaryCollision.H pair machinery:
    ShuffleFisherYates analog via random sort keys).
    """
    from .collisions import _cell_of

    n_cells_tot = 1
    for d in range(geom.ndim):
        n_cells_tot *= geom.n_cell[d]
    cell = _cell_of(sp, geom, n_cells_tot)
    order = jnp.lexsort(
        (jax.random.uniform(key, (sp.capacity,)), cell)
    )
    counts = jnp.zeros(n_cells_tot + 1, jnp.int32).at[cell].add(
        jnp.where(sp.alive, 1, 0)
    )
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    return cell, order, starts, counts, n_cells_tot


def _emit_pair_products(prod, mask, pos_src, u3, w_new, ndim):
    """Emit one product particle per masked pair into free slots of ``prod``.

    ``pos_src``: per-pair position tuple; ``u3``: per-pair proper velocity;
    ``w_new``: per-pair weight.  Pair arrays share a common length.
    """
    cap_s = mask.shape[0]
    cap_d = prod.w.shape[0]
    src_idx = jnp.nonzero(mask, size=cap_s, fill_value=cap_s)[0]
    valid = src_idx < cap_s
    free_idx = jnp.nonzero(~prod.alive, size=cap_s, fill_value=cap_d)[0]
    placeable = valid & (free_idx < cap_d)
    tgt = jnp.where(placeable, free_idx, cap_d)
    src = jnp.minimum(src_idx, cap_s - 1)

    def put(dst_arr, src_arr):
        return dst_arr.at[tgt].set(src_arr[src], mode="drop")

    out = prod.replace(
        w=put(prod.w, w_new),
        ux=put(prod.ux, u3[0]),
        uy=put(prod.uy, u3[1]),
        uz=put(prod.uz, u3[2]),
        alive=prod.alive.at[tgt].set(
            jnp.where(placeable, True, False), mode="drop"
        ),
    )
    pos_d = list(out.positions(ndim))
    for d in range(ndim):
        pos_d[d] = put(pos_d[d], pos_src[d])
    out = out.with_positions(ndim, pos_d)
    if out.extra:
        out = out.replace(extra={
            k: v.at[tgt].set(jnp.zeros((), v.dtype), mode="drop")
            for k, v in out.extra.items()
        })
    return out


def fusion_collision_update(state, cfg, col, dt, key):
    """One nuclear-fusion collision step for CollisionConfig ``col``.

    Builds per-cell pairs (larger set walks the smaller set, incl. repeats),
    computes fusion events, subtracts the reaction weight from the
    reactants, and emits product macroparticles at both parent positions
    with half the reaction weight each (NuclearFusionFunc.H +
    ParticleCreationFunc.H).
    """
    geom = cfg.geometry
    ndim = geom.ndim
    dV = geom.cell_volume
    by_name = {s.name: s for s in cfg.species}
    n1, n2 = col.species
    intra = n1 == n2
    c1, c2 = by_name[n1], by_name[n2]
    sp1 = state.species[n1]
    sp2 = state.species[n2]
    m1, m2 = c1.mass, c2.mass
    k_s1, k_s2, k_ev, k_mom = jax.random.split(key, 4)

    cell1, order1, starts1, counts1, nct = _pairs_for(sp1, geom, k_s1, intra)
    if intra:
        cell2, order2, starts2, counts2 = cell1, order1, starts1, counts1
    else:
        cell2, order2, starts2, counts2, _ = _pairs_for(sp2, geom, k_s2, intra)

    # pair construction on the species-1 walk (idx aligned to sp1 capacity)
    capL = sp1.capacity
    j = jnp.arange(capL)
    cL = cell1[order1]
    rank = j - starts1[jnp.clip(cL, 0, nct)].astype(j.dtype)
    origL = order1
    if intra:
        # first half pairs with second half of the same in-cell shuffle:
        # rank r in [0, floor(N/2)) pairs with rank r + ceil(N/2)
        N = counts1[jnp.clip(cL, 0, nct)].astype(j.dtype)
        half = (N + 1) // 2
        n_pairs = N // 2
        is_pair = (rank < n_pairs)
        partner_rank = rank + half
        mult_ratio = jnp.maximum(N - 1, 1)
        NS = N
    else:
        N1c = counts1[jnp.clip(cL, 0, nct)].astype(j.dtype)
        N2c = counts2[jnp.clip(cL, 0, nct)].astype(j.dtype)
        is_pair = (N2c > 0)
        partner_rank = jnp.where(N2c > 0, rank % jnp.maximum(N2c, 1), 0)
        mult_ratio = jnp.minimum(jnp.maximum(N1c, 1), jnp.maximum(N2c, 1))
        NS = N2c
    alive_pair = (
        sp1.alive[origL] & is_pair & (cL < nct)
    )
    slotS = jnp.clip(
        starts2[jnp.clip(cL, 0, nct)].astype(j.dtype) + partner_rank,
        0, sp2.capacity - 1,
    )
    origS = order2[slotS]
    alive_pair = alive_pair & sp2.alive[origS]

    u1 = (sp1.ux[origL], sp1.uy[origL], sp1.uz[origL])
    u2 = (sp2.ux[origS], sp2.uy[origS], sp2.uz[origS])
    w1 = sp1.w[origL]
    w2 = sp2.w[origS]
    fuse, w_r = fusion_event_weight(
        k_ev, u1, m1, w1, u2, m2, w2, col.fusion_kind, dt, dV,
        col.fusion_multiplier, mult_ratio.astype(w1.dtype),
        col.fusion_probability_threshold,
        col.fusion_probability_target_value,
    )
    fuse = fuse & alive_pair
    w_r = jnp.where(fuse, w_r, 0.0)

    # subtract reaction weight from reactants; kill at zero weight
    new_w1 = sp1.w.at[origL].add(-w_r)
    new_w2 = sp2.w.at[origS].add(-w_r)
    sp1 = sp1.replace(w=new_w1, alive=sp1.alive & (new_w1 > 0.0))
    sp2 = sp2.replace(w=new_w2, alive=sp2.alive & (new_w2 > 0.0))

    # product momenta + emission at both parent positions, weight w_r/2
    pos1 = tuple(p[origL] for p in state.species[n1].positions(ndim))
    pos2 = tuple(p[origS] for p in state.species[n2].positions(ndim))
    species_mut = dict(state.species)
    species_mut[n1] = sp1
    species_mut[n2] = sp2
    w_half = 0.5 * w_r
    if col.fusion_kind == "protonboron":
        ua1, ua2, ua3 = proton_boron_momenta(k_mom, u1, m1, u2, m2)
        prod = species_mut[col.product_species[0]]
        for u3 in (ua1, ua2, ua3):
            for pos in (pos1, pos2):
                prod = _emit_pair_products(prod, fuse, pos, u3, w_half, ndim)
        species_mut[col.product_species[0]] = prod
    else:
        p1name, p2name = col.product_species
        mp1 = by_name[p1name].mass
        mp2 = by_name[p2name].mass
        e_fus = _E_FUSION[col.fusion_kind]
        up1, up2 = two_product_momenta(
            k_mom, u1, m1, u2, m2, mp1, mp2, e_fus
        )
        for pname, u3 in ((p1name, up1), (p2name, up2)):
            prod = species_mut[pname]
            for pos in (pos1, pos2):
                prod = _emit_pair_products(prod, fuse, pos, u3, w_half, ndim)
            species_mut[pname] = prod
    return state.replace(species=species_mut)
