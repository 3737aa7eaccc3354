"""Thermostat ensemble validation: kinetic-energy DISTRIBUTIONS, not just
means (SURVEY.md §4 "thermostat temperature distributions"; VERDICT r3 #6).

In the canonical ensemble the instantaneous kinetic energy follows a
Gamma distribution: 2 KE / kT ~ chi^2(dof), so

    <KE>    = dof kT / 2
    Var(KE) = dof (kT)^2 / 2
    skew    = sqrt(8 / dof)

A thermostat that holds the right MEAN but wrong FLUCTUATIONS (the classic
Berendsen failure) passes a temperature check and fails these. Tested for
the Nosé-Hoover chain and CSVR (Bussi-Donadio-Parrinello) baths on an
argon fluid, plus a binned chi-square goodness-of-fit against the
analytic Gamma law.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from atomsmm_tpu import (
    Context,
    GlobalThermostatIntegrator,
    make_state,
)
from atomsmm_tpu.integrate.propagators import (
    NoseHooverChainPropagator,
    VelocityRescalingPropagator,
)
from atomsmm_tpu.models import argon_system
from atomsmm_tpu.units import BOLTZMANN

T_SET = 120.0


def _ke_samples(bath, n_samples=400, interval=20, seed=11, integrator=None):
    system, x, box = argon_system(n=216, jitter=0.1, seed=4, neighbors=True)
    dof = 3 * 216 - 3
    integ = integrator or GlobalThermostatIntegrator(0.002, bath)
    ctx = Context(system, integ, make_state(x, box=box, seed=seed))
    ctx.set_velocities_to_temperature(T_SET, seed=seed + 1)
    # melt + thermalize (the fluid releases lattice PE early on)
    for _ in range(4):
        ctx.step(100)
        t_now = float(ctx.temperature())
        ctx.set_velocities((T_SET / t_now) ** 0.5 * ctx.state.v)
    ctx.step(500)
    from atomsmm_tpu.state import kinetic_energy

    kes = []
    for _ in range(n_samples):
        ctx.step(interval)
        kes.append(float(kinetic_energy(system.masses, ctx.state.v)))
    return np.asarray(kes), dof


def _chi2_ppf_wilson_hilferty(p, dof):
    """chi2 quantile via the Wilson-Hilferty cube approximation — good to
    ~1e-3 relative for dof in the hundreds (no scipy in this image)."""
    from math import sqrt

    # inverse normal CDF (Acklam's rational approximation)
    def norm_ppf(q):
        a = [-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00]
        b = [-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01]
        c = [-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00]
        d = [7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00]
        plow, phigh = 0.02425, 1 - 0.02425
        if q < plow:
            ql = sqrt(-2 * np.log(q))
            return (((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql
                     + c[4]) * ql + c[5]) / (
                (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
        if q > phigh:
            ql = sqrt(-2 * np.log(1 - q))
            return -(((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql
                      + c[4]) * ql + c[5]) / (
                (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
        ql = q - 0.5
        r = ql * ql
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
                + a[5]) * ql / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3])
                                 * r + b[4]) * r + 1)

    z = norm_ppf(p)
    h = 2.0 / (9.0 * dof)
    return dof * (1.0 - h + z * np.sqrt(h)) ** 3


def _canonical_checks(kes, dof):
    kT = BOLTZMANN * T_SET
    n = len(kes)
    mean_exp = dof * kT / 2.0
    var_exp = dof * kT * kT / 2.0
    se_mean = np.sqrt(var_exp / n)
    mean_err = abs(kes.mean() - mean_exp)
    assert mean_err < 4.0 * se_mean + 0.005 * mean_exp, (
        f"<KE> {kes.mean():.1f} vs {mean_exp:.1f} (4se {4 * se_mean:.2f})")
    rel = abs(kes.var(ddof=1) - var_exp) / var_exp
    assert rel < 0.35, f"Var(KE) off by {rel:.2%}"
    # chi-square goodness of fit on 12 equal-probability bins of the
    # analytic law (2 KE / kT ~ chi2(dof)); threshold is the 99.9% point
    # of chi2(11) ~ 31.3, doubled for sample autocorrelation slack
    k_bins = 12
    edges = [_chi2_ppf_wilson_hilferty(i / k_bins, dof)
             for i in range(1, k_bins)]
    counts, _ = np.histogram(2.0 * kes / kT,
                             bins=[-np.inf] + edges + [np.inf])
    expected = n / k_bins
    chi2_stat = float(((counts - expected) ** 2 / expected).sum())
    assert chi2_stat < 2.0 * 31.3, (
        f"chi2 GOF {chi2_stat:.1f} (counts {counts.tolist()})")


@pytest.mark.slow
def test_nhc_kinetic_energy_distribution():
    kes, dof = _ke_samples(
        NoseHooverChainPropagator(T_SET, 3 * 216 - 3, 0.1))
    _canonical_checks(kes, dof)


@pytest.mark.slow
def test_csvr_kinetic_energy_distribution():
    kes, dof = _ke_samples(
        VelocityRescalingPropagator(T_SET, 3 * 216 - 3, 0.1))
    _canonical_checks(kes, dof)


@pytest.mark.slow
def test_langevin_middle_kinetic_energy_distribution():
    """BAOAB Langevin samples the same canonical KE law. Note Langevin
    thermostats every DOF independently, so dof here is 3N (no conserved
    COM momentum constraint once the noise acts)."""
    from atomsmm_tpu import LangevinMiddleIntegrator

    kes, _ = _ke_samples(
        None, integrator=LangevinMiddleIntegrator(0.002, T_SET, friction=2.0))
    _canonical_checks(kes, 3 * 216)
