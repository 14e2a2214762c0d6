"""ELL_SNG and TABULATED_CT collapse modes."""

import dataclasses

import numpy as np
import pytest


def test_sng_spherical_limit(hmf_validation_cosmology):
    """Spherical triaxial collapse must reproduce delta_c ~ 1.686: the SNG
    ODE's F for lambda_i = delta/3 should satisfy D(z_c) * delta ~ 1.686
    within a few percent (Nadkarni-Ghosh & Singhal 2016)."""
    from pinocchio_tpu.ops.sng import ell_sng_F
    c = hmf_validation_cosmology
    # delta must exceed 1.686/D(a->inf): in this LCDM growth saturates
    # near ~1.3, so delta=1.2 correctly never collapses
    delta = np.array([1.686, 2.5, 4.0])
    lam = delta / 3.0
    D_in = float(c.GrowingMode(1.0 / 1.e-5 - 1.0))
    F = ell_sng_F(lam, lam, lam, D_in, c)
    assert (F > 0).all()
    F_sub = ell_sng_F(np.array([0.4]), np.array([0.4]), np.array([0.4]),
                      D_in, c)
    assert F_sub[0] == 0.0      # sub-critical: no collapse ever
    D_c = np.array([float(c.GrowingMode(f - 1.0)) for f in F])
    dc = D_c * delta
    np.testing.assert_allclose(dc, 1.686, rtol=0.06)


def test_sng_no_collapse_for_voids(hmf_validation_cosmology):
    from pinocchio_tpu.ops.sng import ell_sng_F
    c = hmf_validation_cosmology
    D_in = float(c.GrowingMode(1.0 / 1.e-5 - 1.0))
    F = ell_sng_F(np.array([-0.5]), np.array([-0.6]), np.array([-0.7]),
                  D_in, c)
    assert F[0] == 0.0


def test_delta_sampling_properties():
    from pinocchio_tpu.ops.tabulated import (CT_DELTA0, CT_NBINS_D,
                                             CT_RANGE_D, delta_sampling)
    dv = delta_sampling()
    assert len(dv) == CT_NBINS_D
    assert dv[0] == -CT_RANGE_D
    assert (np.diff(dv) > 0).all()
    # finest sampling near CT_DELTA0
    i0 = np.argmin(np.abs(dv - CT_DELTA0))
    assert np.diff(dv)[max(i0 - 1, 0)] < np.diff(dv)[0]
    assert np.diff(dv)[max(i0 - 1, 0)] < np.diff(dv)[-1]


def test_tabulated_matches_classic(hmf_validation_cosmology):
    """Interpolated table F vs direct classic F on random eigenvalues."""
    import jax.numpy as jnp
    from pinocchio_tpu.ops import tabulated
    from pinocchio_tpu.ops.collapse import ell_classic
    c = hmf_validation_cosmology
    ampl = 1.3
    flat = tabulated.build_ct_table(c, ampl, model="classic")
    tab = jnp.asarray(flat.reshape(tabulated.CT_NBINS_XY,
                                   tabulated.CT_NBINS_XY,
                                   tabulated.CT_NBINS_D).astype(np.float32))
    dv = jnp.asarray(tabulated.delta_sampling().astype(np.float32))
    aux = np.linspace(-tabulated.CT_RANGE_D, tabulated.CT_RANGE_D,
                      tabulated.AUX_N)
    idx_map = jnp.asarray(np.clip(
        np.searchsorted(tabulated.delta_sampling(), aux, "right") - 1,
        0, tabulated.CT_NBINS_D - 2).astype(np.int32))

    rng = np.random.default_rng(3)
    lam = np.sort(rng.normal(0, ampl / np.sqrt(3), (3000, 3)),
                  axis=1)[:, ::-1]
    l1, l2, l3 = (jnp.asarray(lam[:, i], jnp.float32) for i in range(3))
    F_tab = np.asarray(tabulated.interpolate_F(tab, dv, idx_map,
                                               jnp.float32(ampl),
                                               l1, l2, l3))
    bc = np.asarray(ell_classic(l1, l2, l3))
    F_dir = np.where(bc > 0,
                     1.0 + c.InverseGrowingMode(np.maximum(bc, 1e-30)),
                     0.0)
    # compare where clearly collapsing (interpolation smears the boundary)
    sel = (F_dir > 1.0) & (F_tab > 0)
    rel = np.abs(F_tab[sel] - F_dir[sel]) / F_dir[sel]
    assert np.median(rel) < 0.01
    assert (rel < 0.1).mean() > 0.95


def test_tabulated_pipeline(hmf_validation_params,
                            hmf_validation_cosmology):
    """64^3 fmax with ell_model='tabulated' tracks the classic run."""
    from pinocchio_tpu.fmax import run_fmax
    p = dataclasses.replace(hmf_validation_params, GridSize=64,
                            ell_model="tabulated")
    p_classic = dataclasses.replace(p, ell_model="classic")
    c = hmf_validation_cosmology
    r_tab = run_fmax(p, c, verbose=False)
    r_cls = run_fmax(p_classic, c, verbose=False)
    Ft = np.asarray(r_tab.products.Fmax).ravel()
    Fc = np.asarray(r_cls.products.Fmax).ravel()
    # collapsed fractions agree within 2%
    f_t = (Ft >= 1.0).mean()
    f_c = (Fc >= 1.0).mean()
    assert abs(f_t - f_c) < 0.02 * max(f_c, 1e-9)
    # cell-wise: most collapsed cells agree well
    both = (Ft >= 1.0) & (Fc >= 1.0)
    rel = np.abs(Ft[both] - Fc[both]) / Fc[both]
    assert np.median(rel) < 0.02
