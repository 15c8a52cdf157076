"""Frozen end-to-end pipeline values (r2 verdict Next #4a).

Replays the EXACT protocol of tests/fixtures/generate_golden_pipeline.py —
seeded synthetic corpus -> full 3-stage `cli federated` -> `extract` ->
`svm` + `detail-wer` — and asserts the outputs match the committed
golden_pipeline.json: transcripts and AD votes exactly, WER counts
exactly, SVM metrics and param norms to float tolerance. The CLI smoke
tests (tests/test_cli.py) prove the pipeline runs; this test pins what it
computes, so silent drift anywhere in the chain (data prep, staging,
FedAvg/graft, extraction un-padding, WER math, speaker vote) fails loudly.

If a change INTENTIONALLY moves these numbers, regenerate the fixture
(see the generator's docstring) and include the diff in review.
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"

spec = importlib.util.spec_from_file_location(
    "generate_golden_pipeline", FIXTURES / "generate_golden_pipeline.py")
gp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gp)


def test_full_pipeline_matches_frozen_fixture(tmp_path):
    fixture = json.loads((FIXTURES / "golden_pipeline.json").read_text())
    data = gp.build_corpus(tmp_path / "data")
    got = gp.run_pipeline(data, tmp_path / "work")

    # transcripts + AD votes: exact (greedy argmax decisions)
    assert got["utterances"] == fixture["utterances"]

    # detail-WER: integer S/D/I/H counts exact, WER floats tight
    assert set(got["detail_wer"]) == set(fixture["detail_wer"])
    for grp, want in fixture["detail_wer"].items():
        have = got["detail_wer"][grp]
        for k, v in want.items():
            if isinstance(v, float):
                assert have[k] == pytest.approx(v, abs=1e-9), (grp, k)
            else:
                assert have[k] == v, (grp, k)

    # SVM speaker-vote metrics
    for k, v in fixture["svm"].items():
        assert got["svm"][k] == pytest.approx(v, abs=1e-9), k

    # final global params: per-subtree L2 norms (catches aggregation /
    # grafting / optimizer drift even where decodes happen to agree)
    assert set(got["param_norms"]) == set(fixture["param_norms"])
    for k, v in fixture["param_norms"].items():
        np.testing.assert_allclose(got["param_norms"][k], v, rtol=1e-4,
                                   err_msg=k)
