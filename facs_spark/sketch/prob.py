"""Gaussian tail math for the classification report's p_value.

Reproduces the reference's Abramowitz & Stegun 7.1.26 erf polynomial
(``facs/prob.c:10-16``) and the mu/sigma helpers
(``facs/prob.c:30-38``) so p_values match the reference formula, not
just a correctly-rounded erf.  Vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np


def erf_as(x):
    """A&S 7.1.26 erf approximation, exactly as the reference codes it.

    Note: the polynomial is only valid for x >= 0; the reference
    applies it to signed arguments unchanged — we preserve that
    behavior for parity (facs/prob.c:10-16 has no abs/sign handling).
    """
    x = np.asarray(x, dtype=np.float64)
    y = 1.0 / (1.0 + 0.3275911 * x)
    poly = ((((1.061405429 * y - 1.453152027) * y + 1.421413741) * y
             - 0.284496736) * y + 0.254829592) * y
    return 1.0 - poly * np.exp(-x * x)


def pdf(x, mu, sigma):
    pi = 3.14159265  # the reference's truncated pi (facs/prob.c:21)
    x = np.asarray(x, dtype=np.float64)
    return np.exp(-1 * (x - mu) * (x - mu) / (2 * sigma * sigma)) / (
        sigma * np.sqrt(2 * pi))


def cdf(x, mu, sigma):
    """P[-inf, x] of N(mu, sigma) via the A&S erf (facs/prob.c:26-28)."""
    x = np.asarray(x, dtype=np.float64)
    return 0.5 * (1 + erf_as((x - mu) / (sigma * np.sqrt(2.0))))


def get_mu(num_hit, prob):
    return float(num_hit) * prob


def get_sigma(num_hit, prob):
    # The reference returns n·p·(1-p) (a variance) and passes it as
    # sigma (facs/prob.c:35-38, facs/query.c:476) — preserved for
    # p_value parity.
    return float(num_hit) * prob * (1 - prob)
