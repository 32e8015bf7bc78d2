"""Pinned oracle artifacts: committed reference numbers for the CI gates.

The flagship gate (``tests/test_dcr_survey.py::
test_notebook_survey_matches_fdm_oracle``) used to rebuild 401^2 sparse
oracle solves on every CI run — minutes of budget for numbers that only
change when the model or an oracle implementation changes. The pinned
``.npz`` (generated + documented by ``tools/gen_oracle_pins.py``) makes
the gate load them instead; a slow-marked regeneration test
(``tests/test_fdm_oracle.py::test_notebook_oracle_pins_regenerate``)
recomputes the 401^2 values and compares, so oracle/model drift is still
caught — and the reference numbers are diffable in code review.

Replaces the oracle role of the reference's SimPEG notebook cells
(``tests/testNotebook.ipynb`` cells 5-15), whose FEM numbers were
likewise computed once and eyeballed — here they are committed and
asserted.
"""

import os

import numpy as np

__all__ = ["notebook_oracle_pins"]

_PIN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "pins", "notebook_oracle.npz")
_cache = None


def notebook_oracle_pins() -> dict:
    """Load the flagship notebook-model oracle pins.

    Returns a dict with ``electrodes`` (21, 2) and electrode potentials
    ``fdm_201 / fdm_401 / fdm_801 / fem_201 / fem_401 / richardson``
    plus adjacent dipole voltages ``dv_401 / dv_richardson``.
    """
    global _cache
    if _cache is None:
        with np.load(_PIN_PATH) as z:
            _cache = {k: z[k] for k in z.files}
    return _cache
