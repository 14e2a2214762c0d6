"""Cosmology vs the reference's shipped cosmology table.

Oracle: HMF_Validation/pinocchio.test.cosmology.out, written by
cosmo.c:440-499 for the HMF_Validation parameter file (EH spectrum,
sigma8=0.8).  Columns documented in the file header.
"""

import numpy as np
import pytest


def col(tab, i):
    return tab[:, i - 1]


@pytest.fixture(scope="module")
def ctab(reference_cosmology_table):
    return reference_cosmology_table


@pytest.fixture(scope="module")
def cosmo(hmf_validation_cosmology):
    return hmf_validation_cosmology


def test_scale_factor_grid(ctab, cosmo):
    a_ref = col(ctab, 1)
    a = 10.0 ** cosmo._loga_grid
    np.testing.assert_allclose(a, a_ref, rtol=1e-5)


def test_cosmic_time(ctab, cosmo):
    a = col(ctab, 1)
    z = 1.0 / a - 1.0
    np.testing.assert_allclose(cosmo.CosmicTime(z), col(ctab, 2), rtol=2e-4)


def test_comoving_distance(ctab, cosmo):
    n = len(ctab) - 10          # last NBB=10 rows are zero-filled
    a = col(ctab, 1)[:n]
    z = 1.0 / a - 1.0
    np.testing.assert_allclose(cosmo.ComovingDistance(z),
                               col(ctab, 3)[:n], rtol=2e-4)
    np.testing.assert_allclose(cosmo.DiameterDistance(z),
                               col(ctab, 4)[:n], rtol=2e-4)


def test_omega_matter(ctab, cosmo):
    a = col(ctab, 1)
    z = 1.0 / a - 1.0
    np.testing.assert_allclose(cosmo.OmegaMatter(z), col(ctab, 5), rtol=1e-4)


def test_growth_factors(ctab, cosmo):
    a = col(ctab, 1)
    z = 1.0 / a - 1.0
    np.testing.assert_allclose(cosmo.GrowingMode(z), col(ctab, 7), rtol=2e-4)
    np.testing.assert_allclose(cosmo.GrowingMode_2LPT(z), col(ctab, 8),
                               rtol=5e-4)
    np.testing.assert_allclose(-cosmo.GrowingMode_3LPT_1(z), col(ctab, 9),
                               rtol=1e-3)
    np.testing.assert_allclose(cosmo.GrowingMode_3LPT_2(z), col(ctab, 10),
                               rtol=1e-3)


def test_fomega(ctab, cosmo):
    a = col(ctab, 1)
    z = 1.0 / a - 1.0
    np.testing.assert_allclose(cosmo.fomega(z), col(ctab, 11), rtol=5e-4,
                               atol=1e-4)
    np.testing.assert_allclose(cosmo.fomega_2LPT(z), col(ctab, 12), rtol=2e-3)
    np.testing.assert_allclose(cosmo.fomega_3LPT_1(z), col(ctab, 13),
                               rtol=2e-3)
    np.testing.assert_allclose(cosmo.fomega_3LPT_2(z), col(ctab, 14),
                               rtol=2e-3)


def test_mass_variance_gaussian(ctab, cosmo):
    # columns 15/16: Gaussian-window smoothing scale and mass variance
    r = col(ctab, 15)
    var_ref = col(ctab, 16)
    var = cosmo.var_gauss.MassVariance(r)
    np.testing.assert_allclose(var, var_ref, rtol=2e-3)


def test_displacement_variance(ctab, cosmo):
    r = col(ctab, 15)
    got = cosmo.var_gauss.DisplVariance(r)
    want = col(ctab, 17)
    # the reference's own GSL adaptive integral fails to converge at the
    # single most extreme bin (R=1e-5 Mpc: table says 245.112 while its
    # own neighbouring bins and the converged R->0 limit are 236.616);
    # the vectorized trapezoid gets the correct limit, so exclude that
    # unphysical bin (10 pc smoothing) from the oracle comparison.
    sane = r > 2e-5
    np.testing.assert_allclose(got[sane], want[sane], rtol=2e-3)
    np.testing.assert_allclose(got[~sane], 236.616, rtol=2e-3)


def test_power_spectrum(ctab, cosmo):
    k = col(ctab, 19)
    np.testing.assert_allclose(cosmo.PowerSpectrum(k), col(ctab, 20),
                               rtol=2e-3)


def test_sigma8_normalization(cosmo):
    # after normalization, sigma(8/h Mpc, top-hat) must equal Sigma8
    var8 = cosmo.ComputeMassVariance(8.0 / cosmo.p.Hubble100, 2)
    np.testing.assert_allclose(np.sqrt(var8), 0.8, rtol=1e-6)


def test_inverse_growth_roundtrip(cosmo):
    for z in (0.0, 0.5, 1.0, 3.0, 10.0):
        D = cosmo.GrowingMode(z)
        np.testing.assert_allclose(cosmo.InverseGrowingMode(D), z,
                                   rtol=1e-4, atol=1e-5)
