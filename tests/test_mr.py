"""Mesh refinement (two-level Vay substitution scheme, core/mr.py).

Golden gate: the reference's own test_2d_langmuir_multi_mr checksums
(Examples/Tests/langmuir/inputs_test_2d_langmuir_multi_mr).  The absorber
internals differ from the reference PML, so the gates are physics-level:
particles at 5e-3, fields at 2.5e-2 (measured: momenta 1.7e-3, lev=0 E
1.5e-3, lev=1 E 4.9e-3, lev=1 j 9.7e-3).  |By| is excluded: the Langmuir
wave is electrostatic and By is pure noise floor (|By|/|Ex| ~ 1e-11).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

DECK = (
    "/root/reference/Examples/Tests/langmuir/inputs_test_2d_langmuir_multi_mr"
)
GOLD = (
    "/root/reference/Regression/Checksum/benchmarks_json/"
    "test_2d_langmuir_multi_mr.json"
)


def _rel(a, b):
    return abs(a - b) / (abs(b) or 1.0)


@pytest.mark.slow
def test_langmuir_multi_mr_golden():
    sim = Simulation.from_deck(DECK)
    sim.init()
    sim.evolve()
    cs = sim.checksums()
    gold = json.load(open(GOLD))
    for sp in ("electrons", "positrons"):
        for k, ref in gold[sp].items():
            assert _rel(cs[sp][k], ref) < 5e-3, (sp, k, cs[sp][k], ref)
    for lev in ("lev=0", "lev=1"):
        for k, ref in gold[lev].items():
            if k == "By":  # noise floor (see module docstring)
                continue
            assert _rel(cs[lev][k], ref) < 2.5e-2, (lev, k, cs[lev][k], ref)
    # the noise-floor By must still be noise-floor small relative to E
    for lev in ("lev=0", "lev=1"):
        assert cs[lev]["By"] < 1e-9 * cs[lev]["Ex"]


@pytest.mark.slow
def test_langmuir_multi_mr_anisotropic():
    """Anisotropic refinement (amr.ref_ratio_vect = 4 2).

    Gates: particles + lev=0 against the reference goldens.  The lev=1
    golden sums are NOT comparable: the deck's physics is exactly x/z
    symmetric and the golden's own lev=0 shows that symmetry
    (Ex=7.573e12 vs Ez=7.582e12), yet its lev=1 has Ex/Ez = 0.656 — an
    artifact of yt's isotropic-refine_by covering_grid indexing on the
    anisotropically refined plotfile.  We instead gate the physics the
    artifact hides: lev=1 x/z symmetry of our covering-grid output.
    """
    sim = Simulation.from_deck(DECK + "_anisotropic")
    sim.init()
    sim.evolve()
    cs = sim.checksums()
    gold = json.load(
        open(GOLD.replace(".json", "_anisotropic.json"))
    )
    for sp in ("electrons", "positrons"):
        for k, ref in gold[sp].items():
            assert _rel(cs[sp][k], ref) < 5e-3, (sp, k, cs[sp][k], ref)
    for k, ref in gold["lev=0"].items():
        if k == "By":
            continue
        assert _rel(cs["lev=0"][k], ref) < 2.5e-2, (k, cs["lev=0"][k], ref)
    assert _rel(cs["lev=1"]["Ex"], cs["lev=1"]["Ez"]) < 3e-2
    assert _rel(cs["lev=1"]["jx"], cs["lev=1"]["jz"]) < 3e-2


def _mini_cfg(**over):
    from warpx_tpu.core.config import SimConfig
    from warpx_tpu.core.grid import Geometry, yee_staggering

    geom = Geometry(
        ndim=2, n_cell=(32, 32),
        prob_lo=(-16.0, -16.0), prob_hi=(16.0, 16.0),
        periodic=(True, True),
    )
    base = dict(
        geometry=geom, max_step=1, dt=1e-9, species=(), max_level=1,
        ref_ratio=2, fine_tag_lo=(-8.0, -8.0), fine_tag_hi=(8.0, 8.0),
        pml_ncell=8,
    )
    base.update(over)
    cfg = SimConfig(**base)
    return cfg, yee_staggering(2)


def test_coarsen_preserves_constants():
    """The staggering-aware average-down reproduces a constant field inside
    the region where its stencil has full support."""
    from warpx_tpu.core.mr import MRLayout, coarsen_field

    cfg, stag = _mini_cfg()
    lay = MRLayout(cfg, stag)
    for comp in ("jx", "jz", "rho"):
        arr = jnp.ones(lay.n_fext)
        out = np.asarray(coarsen_field(arr, stag[comp], lay))
        npml_c = lay.npml_c
        inner = out[npml_c + 1:-npml_c - 1, npml_c + 1:-npml_c - 1]
        assert np.allclose(inner, 1.0, atol=1e-14), comp


def test_interp_preserves_constants_and_linears():
    """The 2-pt aux interpolation (warpx_interp) is exact for constants and
    linear fields away from the zero-padded border."""
    from warpx_tpu.core.mr import MRLayout, _axis_apply

    cfg, stag = _mini_cfg()
    lay = MRLayout(cfg, stag)
    for comp in ("Ex", "Ez", "By", "Bx"):
        flags = stag[comp]
        # linear-in-x coarse field sampled at the comp's staggered sites
        xs = (
            np.arange(lay.n_cext[0]) + (0.0 if flags[0] == 1 else 0.5)
        )
        src = jnp.asarray(np.broadcast_to(
            xs[:, None], lay.n_cext).astype(float))
        tabs = lay.interp_tables(flags)
        out = src
        for d, (idx, w) in enumerate(tabs):
            out = _axis_apply(out, d, idx, w)
        out = np.asarray(out)
        # expected: same linear field in fine coordinates
        h = 0.0 if flags[0] == 1 else 0.5
        xf = (np.arange(lay.n_fext[0]) + h + lay.f_off[0]) / lay.rv[0] - (
            lay.c_off[0] + h
        ) + (0.0 if flags[0] == 1 else 0.5)
        exp = np.broadcast_to(xf[:, None], lay.n_fext)
        inner = (slice(lay.rv[0], -lay.rv[0]), slice(lay.rv[1], -lay.rv[1]))
        assert np.allclose(out[inner], exp[inner], atol=1e-12), comp


def test_patch_pml_absorbs():
    """A pulse launched on the fine patch decays through the PML ring
    instead of wrapping (split-field absorber quality check)."""
    from warpx_tpu.core.mr import MRLayout, make_patch_advance, _part_keys

    cfg, stag = _mini_cfg()
    lay = MRLayout(cfg, stag)
    c = 299792458.0
    dt = 0.9 * lay.dxf[0] / (c * np.sqrt(2.0))
    b_step, e_step = make_patch_advance(
        lay, stag, "yee", 0.5 * dt, dt, True, jnp.float64
    )

    def adv(parts, j3):
        return b_step(e_step(b_step(parts), j3))
    parts = {k: jnp.zeros(lay.n_fext) for k in _part_keys(lay)}
    # gaussian Ey pulse in the patch center
    nx, nz = lay.n_fext
    x = np.arange(nx) - nx / 2
    z = np.arange(nz) - nz / 2
    g = np.exp(-(x[:, None] ** 2 + z[None, :] ** 2) / 4.0**2)
    parts["Ey:0"] = jnp.asarray(g)
    j0 = tuple(jnp.zeros(lay.n_fext) for _ in range(3))
    e0 = float(jnp.sum(parts["Ey:0"] ** 2))
    for _ in range(300):
        parts = adv(parts, j0)
    ey = parts["Ey:0"] + parts["Ey:1"]
    e_end = float(jnp.sum(ey**2))
    assert e_end < 1e-4 * e0, (e_end, e0)


def test_mr_gate_subcycling_ratio():
    """OneStep_sub1 runs exactly two fine substeps: subcycling with
    ref_ratio != 2 must hard-fail, ratio 2 must construct."""
    from warpx_tpu.utils.parser import Deck

    base = """
        amr.max_level = 1
        amr.n_cell = 16 16
        amr.ref_ratio = {r}
        geometry.dims = 2
        geometry.prob_lo = -1 -1
        geometry.prob_hi = 1 1
        boundary.field_lo = periodic periodic
        boundary.field_hi = periodic periodic
        warpx.do_subcycling = 1
        warpx.fine_tag_lo = -0.5 -0.5
        warpx.fine_tag_hi = 0.5 0.5
        """
    with pytest.raises(NotImplementedError):
        Simulation.from_deck(Deck.from_string(base.format(r=4)))
    Simulation.from_deck(Deck.from_string(base.format(r=2)))


def _mr_state(cfg, stag, layout, rng_fields=False):
    import dataclasses as _dc

    import jax

    from warpx_tpu.core.mr import mr_init_aux
    from warpx_tpu.core.state import FieldState, SimState

    dtype = jnp.float64
    n = cfg.geometry.n_cell
    rng = np.random.default_rng(7)

    def arr(scale):
        if not rng_fields:
            return jnp.zeros(n, dtype)
        return jnp.asarray(rng.standard_normal(n) * scale, dtype)

    fields = FieldState(
        Ex=arr(1.0), Ey=arr(1.0), Ez=arr(1.0),
        Bx=arr(1e-8), By=arr(1e-8), Bz=arr(1e-8),
        jx=jnp.zeros(n, dtype), jy=jnp.zeros(n, dtype),
        jz=jnp.zeros(n, dtype),
    )
    aux = mr_init_aux(cfg, layout, dtype)
    return SimState(
        fields=fields, species={}, step=jnp.asarray(0, jnp.int32),
        time=jnp.asarray(0.0, dtype), rng=jax.random.PRNGKey(0), aux=aux,
    )


def test_subcycling_lev0_field_equivalence():
    """Without patch feedback (zero fine fields, no particles), the
    subcycled mother-grid split advance [B,E]/[E,B] with half steps
    composes to exactly the plain B/E/B step."""
    import dataclasses as _dc

    from warpx_tpu.core.mr import MRLayout, make_mr_step

    cfg, stag = _mini_cfg()
    c = 299792458.0
    dx = cfg.geometry.dx[0]
    cfg = _dc.replace(cfg, dt=0.5 * dx / (c * np.sqrt(2.0)), max_step=5)
    cfg_s = _dc.replace(cfg, do_subcycling=True)
    step_n, _, lay = make_mr_step(cfg, stag)
    step_s, _, lay_s = make_mr_step(cfg_s, stag)
    s_n = _mr_state(cfg, stag, lay, rng_fields=True)
    s_s = s_n
    for _ in range(5):
        s_n = step_n(s_n)
        s_s = step_s(s_s)
    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        a = np.asarray(getattr(s_n.fields, nm))
        b = np.asarray(getattr(s_s.fields, nm))
        assert np.allclose(a, b, rtol=1e-12, atol=1e-14), nm


@pytest.mark.slow
def test_nci_corrector_mr_subcycled():
    """inputs_test_2d_nci_corrector_mr: full-domain refined patch, subcycled,
    Godfrey corrector on.  Gate = the reference's own analysis_ncicorr.py
    criterion (lev-0 EM energy < 1e28 after 600 steps, vs 5e32 with the
    corrector off) plus particle golden checksums."""
    sim = Simulation.from_deck(
        "/root/reference/Examples/Tests/nci_fdtd_stability/"
        "inputs_test_2d_nci_corrector_mr"
    )
    sim.init()
    sim.evolve()
    cs = sim.checksums()
    c = 299792458.0
    st = sim.state
    energy = float(
        jnp.sum(st.fields.Ex**2 + st.fields.Ez**2 + c**2 * st.fields.By**2)
    )
    assert energy < 1.0e28, energy
    gold = json.load(open(
        "/root/reference/Regression/Checksum/benchmarks_json/"
        "test_2d_nci_corrector_mr.json"
    ))
    for sp in ("electrons", "ions"):
        for k in ("particle_position_x", "particle_position_y",
                  "particle_momentum_z", "particle_weight"):
            assert _rel(cs[sp][k], gold[sp][k]) < 5e-3, (
                sp, k, cs[sp][k], gold[sp][k])
