"""Examples as acceptance tests (the reference's only validation artifacts
are its examples, SURVEY §4); thresholds assert the recovered structure."""
import sys

import pytest


@pytest.mark.slow
def test_eeg_example_recovers_support():
    sys.path.insert(0, "examples")
    import examples.example_EEG_CP as ex

    ds, dsa = ex.main()
    # reference-analog quality bar: cleaned Dice score of the recovered
    # source support (the printed values match the compiled reference
    # oracle on the same synthesized problem: 0.53 raw / 0.72 cleaned)
    assert dsa >= 0.6
    assert ds >= 0.4


@pytest.mark.slow
def test_labeling_example_denoises():
    import examples.example_labeling_CP as ex

    acc_in, acc_out = ex.main()
    assert acc_out >= acc_in + 0.2  # regularization must add real accuracy
    assert acc_out >= 0.85


@pytest.mark.slow
def test_distributed_example_agrees():
    import examples.example_distributed as ex

    # runs on the test session's virtual 8-device CPU mesh; the example
    # itself asserts all three distributed paths match the single-device
    # solve and that cut-pursuit recovers the support
    ex.main()
