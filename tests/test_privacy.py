"""RDP accountant tests (federated/privacy.py): closed-form anchors for the
sampled-Gaussian Renyi divergence (q=1 plain Gaussian, the exact alpha=2
moment), amplification/monotonicity/composition laws, conversion-bound
tightness vs the classic RDP->(eps, delta) formula, state roundtrip, and the
engine integration — dp_epsilon rows in the round log and exact continuation
through the '-dp.json' checkpoint sidecar."""

import json
import math

import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.federated.privacy import (
    DEFAULT_ALPHAS,
    DpAccountant,
    epsilon_for_rounds,
    noise_for_epsilon,
    rdp_sampled_gaussian,
    rdp_to_epsilon,
)


def test_q1_reduces_to_plain_gaussian():
    sigma = 1.3
    rdp = rdp_sampled_gaussian(1.0, sigma)
    want = np.asarray(DEFAULT_ALPHAS, np.float64) / (2 * sigma * sigma)
    np.testing.assert_allclose(rdp, want, rtol=1e-12)


def test_alpha2_closed_form():
    # at alpha=2 the moment sum collapses: (1-q)^2 + 2q(1-q) + q^2 e^{1/s^2}
    # = 1 + q^2 (e^{1/s^2} - 1)
    for q, sigma in [(0.01, 1.0), (0.3, 0.8), (0.9, 2.0)]:
        got = rdp_sampled_gaussian(q, sigma, alphas=(2,))[0]
        want = math.log(1.0 + q * q * (math.exp(1.0 / sigma**2) - 1.0))
        assert got == pytest.approx(want, rel=1e-12)


def test_edge_cases():
    assert rdp_sampled_gaussian(0.0, 1.0).max() == 0.0
    assert np.isinf(rdp_sampled_gaussian(0.5, 0.0)).all()
    assert epsilon_for_rounds(0, 0.5, 1.0, 1e-5) == 0.0
    with pytest.raises(ValueError, match="q must be"):
        rdp_sampled_gaussian(1.5, 1.0)
    with pytest.raises(ValueError, match="delta"):
        rdp_to_epsilon(np.ones(len(DEFAULT_ALPHAS)), 2.0)


def test_amplification_and_monotonicity():
    # subsampling amplifies: eps(q) strictly increasing in q
    e = [epsilon_for_rounds(100, q, 1.0, 1e-5) for q in (0.05, 0.2, 1.0)]
    assert e[0] < e[1] < e[2]
    # more noise, less epsilon
    s = [epsilon_for_rounds(100, 0.2, z, 1e-5) for z in (0.8, 1.0, 2.0)]
    assert s[0] > s[1] > s[2]
    # more rounds, more epsilon
    r = [epsilon_for_rounds(t, 0.2, 1.0, 1e-5) for t in (10, 100, 1000)]
    assert r[0] < r[1] < r[2]
    # smaller delta, more epsilon
    d = [epsilon_for_rounds(100, 0.2, 1.0, dd) for dd in (1e-3, 1e-5, 1e-8)]
    assert d[0] < d[1] < d[2]


def test_rdp_composition_beats_naive_epsilon_sum():
    # RDP composition must be no worse than summing per-round epsilons
    # (that is the point of the accountant); check it is strictly better
    # at realistic settings
    q, sigma, delta, t = 0.25, 1.0, 1e-5, 200
    eps_one = epsilon_for_rounds(1, q, sigma, delta)
    eps_t = epsilon_for_rounds(t, q, sigma, delta)
    assert eps_t < t * eps_one * 0.5


def test_improved_conversion_not_worse_than_classic():
    rdp = 50 * rdp_sampled_gaussian(0.1, 1.2)
    a = np.asarray(DEFAULT_ALPHAS, np.float64)
    classic = float(np.min(rdp + math.log(1.0 / 1e-5) / (a - 1.0)))
    eps, best_alpha = rdp_to_epsilon(rdp, 1e-5)
    assert eps <= classic
    assert best_alpha in DEFAULT_ALPHAS


def test_accountant_accumulates_and_roundtrips():
    acc = DpAccountant(delta=1e-5)
    assert acc.epsilon() == 0.0
    acc.step(0.5, 1.0, num_steps=7)
    acc.step(0.25, 2.0, num_steps=3)  # heterogeneous stages compose
    assert acc.steps == 10
    want = 7 * rdp_sampled_gaussian(0.5, 1.0) + 3 * rdp_sampled_gaussian(
        0.25, 2.0)
    np.testing.assert_allclose(acc.total_rdp, want, rtol=1e-12)
    clone = DpAccountant.from_state(json.loads(json.dumps(acc.state_dict())))
    assert clone.epsilon() == pytest.approx(acc.epsilon(), rel=1e-12)
    assert clone.epsilon(1e-3) < clone.epsilon(1e-7)


def test_homogeneous_accountant_matches_epsilon_for_rounds():
    acc = DpAccountant(delta=1e-6)
    for _ in range(25):
        acc.step(0.3, 1.1)
    assert acc.epsilon() == pytest.approx(
        epsilon_for_rounds(25, 0.3, 1.1, 1e-6), rel=1e-12)


def test_noise_for_epsilon_inverts_forward():
    rounds, q, delta, target = 50, 0.2, 1e-5, 4.0
    z = noise_for_epsilon(rounds, q, target, delta)
    # achieves the target...
    assert epsilon_for_rounds(rounds, q, z, delta) <= target
    # ...and is the SMALLEST such sigma up to the bisection tolerance
    assert epsilon_for_rounds(rounds, q, z - 2e-4, delta) > target
    with pytest.raises(ValueError, match="unreachable"):
        noise_for_epsilon(10000, 1.0, 1e-4, 1e-9, hi=5.0)
    with pytest.raises(ValueError, match="target_epsilon"):
        noise_for_epsilon(10, 0.5, 0.0, 1e-5)


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------


def test_engine_logs_running_epsilon():
    from tests.test_dp import _engine

    eng = _engine(dp_clip=0.05, dp_noise=0.5)
    rows = []
    orig = eng.logger.log
    eng.logger.log = lambda row: (rows.append(dict(row)), orig(row))[1]
    eng.run_rounds(stage=2, num_rounds=3)
    eps_rows = [r for r in rows if "dp_epsilon" in r]
    assert len(eps_rows) == 3
    eps = [r["dp_epsilon"] for r in eps_rows]
    assert all(e > 0 for e in eps)
    assert eps == sorted(eps)  # budget only ever grows
    assert eps_rows[0]["dp_delta"] == eng.fcfg.dp_delta
    # q=1 (frac=1.0), sigma=0.5: row N must equal the closed-form budget
    want = epsilon_for_rounds(3, 1.0, 0.5, eng.fcfg.dp_delta)
    assert eps[-1] == pytest.approx(want, abs=1e-4)


def test_engine_without_dp_logs_no_epsilon():
    from tests.test_dp import _engine

    eng = _engine()
    rows = []
    orig = eng.logger.log
    eng.logger.log = lambda row: (rows.append(dict(row)), orig(row))[1]
    eng.run_rounds(stage=2, num_rounds=1)
    assert not any("dp_epsilon" in r for r in rows)


def test_engine_resume_continues_budget_from_sidecar(tmp_path):
    """Two rounds, crash, resume, one more round: the resumed engine must
    report the same epsilon as a straight-through 3-round run (the
    '-dp.json' sidecar carries the accountant across the restart)."""
    import dataclasses

    from tests.test_dp import _engine

    def with_saves(eng):
        eng.fcfg = dataclasses.replace(
            eng.fcfg, round_save_dir=str(tmp_path), round_save_every=1)
        return eng

    straight = with_saves(_engine(dp_clip=0.05, dp_noise=0.5))
    # independent save dir so the straight run never resumes the other's
    straight.fcfg = dataclasses.replace(
        straight.fcfg, round_save_dir=str(tmp_path / "straight"))
    straight.run_rounds(stage=2, num_rounds=3)
    want = straight._dp_accountant.epsilon()

    first = with_saves(_engine(dp_clip=0.05, dp_noise=0.5))
    first.run_rounds(stage=2, num_rounds=2)
    assert (tmp_path / "stage2-round-2-dp.json").exists()
    resumed = with_saves(_engine(dp_clip=0.05, dp_noise=0.5))
    resumed.run_rounds(stage=2, num_rounds=3)  # resumes at round 2, runs 1
    assert resumed._dp_accountant.steps == 3
    assert resumed._dp_accountant.epsilon() == pytest.approx(want, rel=1e-12)


def test_engine_resume_without_sidecar_rebuilds(tmp_path):
    """A pre-accountant checkpoint (no '-dp.json') must rebuild the resumed
    stage's spend instead of silently restarting epsilon from zero."""
    import dataclasses

    from tests.test_dp import _engine

    first = _engine(dp_clip=0.05, dp_noise=0.5)
    first.fcfg = dataclasses.replace(
        first.fcfg, round_save_dir=str(tmp_path), round_save_every=1)
    first.run_rounds(stage=2, num_rounds=2)
    (tmp_path / "stage2-round-2-dp.json").unlink()

    resumed = _engine(dp_clip=0.05, dp_noise=0.5)
    resumed.fcfg = dataclasses.replace(
        resumed.fcfg, round_save_dir=str(tmp_path), round_save_every=1)
    rows = []
    orig = resumed.logger.log
    resumed.logger.log = lambda row: (rows.append(dict(row)), orig(row))[1]
    resumed.run_rounds(stage=2, num_rounds=3)
    assert any("fl_resume_dp_accountant_rebuilt" in r for r in rows)
    assert resumed._dp_accountant.steps == 3
    assert resumed._dp_accountant.epsilon() == pytest.approx(
        epsilon_for_rounds(3, 1.0, 0.5, resumed.fcfg.dp_delta), rel=1e-12)
