"""Unit tests: trig LUTs vs the reference source, C/A codes vs ICD truth."""

import os
import re

import numpy as np
import pytest

from pluto_gps_sim_tpu.models.cacode import CA_TABLE, ca_code
from pluto_gps_sim_tpu.models.tables import (
    ANT_PAT_DB,
    COS_TABLE_512,
    SIN_TABLE_512,
    ant_pat_linear,
)

_REF = "/root/reference/plutogpssim.c"


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not mounted")
def test_luts_match_reference_source():
    src = open(_REF).read()

    def grab(name):
        m = re.search(r"const int %s\[\] = \{(.*?)\};" % name, src, re.S)
        return np.array([int(x) for x in re.findall(r"-?\d+", m.group(1))],
                        dtype=np.int32)

    np.testing.assert_array_equal(SIN_TABLE_512, grab("sinTable512"))
    np.testing.assert_array_equal(COS_TABLE_512, grab("cosTable512"))


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not mounted")
def test_ant_pat_matches_reference_source():
    src = open(_REF).read()
    m = re.search(r"const double ant_pat_db\[37\] = \{(.*?)\};", src, re.S)
    vals = np.array([float(x) for x in re.findall(r"\d+\.\d+", m.group(1))])
    np.testing.assert_array_equal(ANT_PAT_DB, vals)


def test_lut_shapes_and_range():
    assert SIN_TABLE_512.shape == (512,)
    assert COS_TABLE_512.shape == (512,)
    assert SIN_TABLE_512.max() == 512 and SIN_TABLE_512.min() == -510
    assert COS_TABLE_512.max() == 512
    assert COS_TABLE_512[384] == 0  # documented reference quirk


def _first10_octal(prn: int) -> int:
    chips = ca_code(prn)[:10]
    return int("".join(str(int(c)) for c in chips), 2)


def test_ca_first_chips_icd():
    # ICD-GPS-200 Table 3-I: first 10 chips (octal) for selected PRNs
    truth = {1: 0o1440, 2: 0o1620, 3: 0o1710, 4: 0o1744, 5: 0o1133}
    for prn, expect in truth.items():
        assert _first10_octal(prn) == expect, f"PRN {prn}"


def test_ca_structure():
    assert CA_TABLE.shape == (32, 1023)
    assert set(np.unique(CA_TABLE)) == {0, 1}
    # Gold codes are balanced: 512 ones per period
    assert np.all(CA_TABLE.sum(axis=1) == 512)
    # all PRNs distinct
    assert len({tuple(row) for row in CA_TABLE}) == 32


def test_ant_pat_linear():
    lin = ant_pat_linear()
    assert lin[0] == 1.0
    assert np.all(np.diff(lin[1:]) < 0)


def test_ca_code_rejects_bad_prn():
    with pytest.raises(ValueError):
        ca_code(0)
    with pytest.raises(ValueError):
        ca_code(33)
