"""The bench parity gate actually gates (VERDICT round-3 item 6).

``bench.py`` refuses to publish an RTF when ``production_parity`` fails;
this pins both halves end-to-end on the CPU backend (kernel in interpret
mode): the healthy production path passes the tightened bounds, and the
deliberate word-row fault injection (``TrackingConfig.ablate_word_row`` —
the documented "misaligned word rows" lowering failure) collapses the
prompts and FAILS the gate, which would make bench.py exit non-zero
(``bench.py:428-431``).

Runs in the default suite (~20 s with the committed truth cache): the
gate is the bench's last line of defence and must never rot.
"""

import pytest

from tools.chip_parity import _cpu_truth, SETUP, production_parity


@pytest.fixture(scope="module")
def ns():
    _cpu_truth()
    n = {}
    exec(SETUP, n)
    return n


def test_healthy_production_path_passes(ns):
    res = production_parity(ns)
    assert res["parity_ok"], res
    assert res["parity_metric"] <= 0.85, res
    assert res["parity_scaled"] <= 0.15, res
    assert 0.93 <= res["prompt_ratio"] <= 1.07, res


def test_ablated_lowering_fails(ns):
    res = production_parity(ns, ablate=True)
    assert not res["parity_ok"], (
        "word-row fault injection must fail the parity gate", res)
    # the signature of a misaligned word table: prompt power collapses
    assert res["prompt_ratio"] < 0.93, res
