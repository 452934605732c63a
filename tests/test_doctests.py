"""Doctest execution over the package's docstring examples.

The reference's main behavioral coverage is ``--doctest-modules``
(``/root/reference/pysgmcmc/pytest.ini:1-4``); this runs the same kind of
executable-documentation checks over our modules (collected explicitly so
the jax platform forcing in conftest applies first).
"""

import doctest

import pytest

import pysgmcmc_tpu.data_batches
import pysgmcmc_tpu.diagnostics.objective_functions
import pysgmcmc_tpu.sampling
import pysgmcmc_tpu.stepsize_schedules
import pysgmcmc_tpu.utils.numeric

MODULES = [
    pysgmcmc_tpu.diagnostics.objective_functions,
    pysgmcmc_tpu.sampling,
    pysgmcmc_tpu.stepsize_schedules,
    pysgmcmc_tpu.utils.numeric,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, "{} doctest failures in {}".format(
        results.failed, module.__name__
    )
    assert results.attempted > 0, "no doctests found in {}".format(
        module.__name__
    )
