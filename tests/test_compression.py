"""Uplink-compressed FedAvg (parallel/fed.py compressed_delta_fedavg) and
slice-aware mesh construction (parallel/mesh.py make_multislice_mesh):
quantizer exactness/error-bound/unbiasedness, engine wiring, and GSPMD
correctness of the compressed aggregate over a simulated multi-slice mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.federated import FederatedConfig
from privacy_preserve_federated_asr_tpu.parallel import (
    compressed_delta_fedavg,
    fedavg_stacked,
    make_multislice_mesh,
)

from tests.test_dp import _engine, _stack


def test_grid_aligned_deltas_are_lossless():
    """Deltas that already sit on the quantizer's grid (amax * k/127) must
    round-trip exactly, so the compressed aggregate equals plain FedAvg."""
    g = {"w": jnp.zeros((4,), jnp.float32)}
    # amax 31.75 -> scale 0.25: every entry is an exact multiple of 0.25
    c1 = {"w": jnp.array([31.75, -31.75, 5.0, 0.0], jnp.float32)}
    c2 = {"w": jnp.array([0.25, 0.5, -0.75, 31.75], jnp.float32)}
    stacked = _stack([c1, c2])
    out = compressed_delta_fedavg(stacked, g, bits=8)
    plain = fedavg_stacked(stacked)
    np.testing.assert_allclose(np.asarray(out["w"]), np.asarray(plain["w"]),
                               rtol=0, atol=1e-7)


def test_nearest_rounding_error_bound():
    """Per client the worst-case error per coordinate is scale/2 =
    amax / (2 * 127); the mean over K clients is bounded by the mean of the
    per-client bounds."""
    rng = np.random.default_rng(0)
    k = 4
    g = {"w": jnp.zeros((64, 32), jnp.float32)}
    clients = [{"w": jnp.asarray(rng.normal(0, 1, (64, 32)), jnp.float32)}
               for _ in range(k)]
    stacked = _stack(clients)
    out = compressed_delta_fedavg(stacked, g, bits=8)
    plain = fedavg_stacked(stacked)
    bound = float(np.mean([np.abs(c["w"]).max() / (2 * 127) for c in clients]))
    err = np.abs(np.asarray(out["w"]) - np.asarray(plain["w"])).max()
    assert err <= bound + 1e-7, (err, bound)


def test_stochastic_rounding_is_unbiased():
    """floor(x/s + u) with u~U[0,1) has expectation x/s: averaging the
    compressed aggregate over many rng draws must converge to the exact
    mean (nearest rounding would keep a deterministic offset)."""
    g = {"w": jnp.zeros((8,), jnp.float32)}
    # values deliberately OFF the int8 grid
    c = {"w": jnp.array([0.30, -0.11, 0.77, 1.0, -0.63, 0.049, 0.5001, -1.0],
                        jnp.float32)}
    stacked = _stack([c])
    draws = np.stack([
        np.asarray(compressed_delta_fedavg(
            stacked, g, bits=8, rng=jax.random.PRNGKey(s))["w"])
        for s in range(600)
    ])
    scale = 1.0 / 127  # amax 1.0
    np.testing.assert_allclose(draws.mean(axis=0), np.asarray(c["w"]),
                               atol=3 * scale / np.sqrt(600) + 1e-6)


def test_low_bit_quantization_is_coarser():
    rng = np.random.default_rng(1)
    g = {"w": jnp.zeros((32, 16), jnp.float32)}
    clients = [{"w": jnp.asarray(rng.normal(0, 1, (32, 16)), jnp.float32)}
               for _ in range(2)]
    stacked = _stack(clients)
    plain = np.asarray(fedavg_stacked(stacked)["w"])
    err2 = np.abs(np.asarray(
        compressed_delta_fedavg(stacked, g, bits=2)["w"]) - plain).mean()
    err8 = np.abs(np.asarray(
        compressed_delta_fedavg(stacked, g, bits=8)["w"]) - plain).mean()
    assert err2 > 10 * err8


def test_bits_range_validated():
    g = {"w": jnp.zeros((2,), jnp.float32)}
    stacked = _stack([g])
    with pytest.raises(ValueError, match="bits"):
        compressed_delta_fedavg(stacked, g, bits=9)
    with pytest.raises(ValueError, match="bits"):
        compressed_delta_fedavg(stacked, g, bits=1)


def test_config_rejects_compress_with_dp():
    with pytest.raises(ValueError, match="mutually exclusive"):
        FederatedConfig(compress_bits=8, dp_clip_norm=1.0)


def test_engine_compressed_round_deterministic_and_close_to_vanilla():
    """cli federated --compress_bits 8: the jitted round aggregates
    quantized deltas — deterministic in the seed, and within the int8
    quantization envelope of the vanilla aggregate."""
    import dataclasses as dc

    def engine():
        eng = _engine(seed=0)
        eng.fcfg = dc.replace(eng.fcfg, compress_bits=8)
        return eng

    a = engine()
    a.run_rounds(stage=2, num_rounds=1)
    b = engine()
    b.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a.global_params, b.global_params)

    vanilla = _engine(seed=0)
    vanilla.run_rounds(stage=2, num_rounds=1)
    # only the stage network (arbitrator) moves; compression error is
    # bounded by the per-client delta amax / 127 (stochastic rounding is
    # within one grid step of nearest)
    va = np.asarray(vanilla.global_params["arbitrator"]["kernel"], np.float32)
    ca = np.asarray(a.global_params["arbitrator"]["kernel"], np.float32)
    g0 = np.asarray(_engine(seed=0).global_params["arbitrator"]["kernel"],
                    np.float32)
    movement = np.abs(va - g0).max()
    assert movement > 0  # the round actually trained
    # int8 quantization error (~amax/127 per client) must be far below the
    # training signal itself
    assert np.abs(ca - va).max() <= 0.25 * movement + 1e-6
    # untouched networks are bit-identical (graft keeps them)
    np.testing.assert_array_equal(
        np.asarray(a.global_params["lm_head"]["kernel"]),
        np.asarray(vanilla.global_params["lm_head"]["kernel"]))


def test_multislice_mesh_layout():
    """Each (client-row, data) block must stay inside one simulated slice;
    clients spread across slices."""
    devs = jax.devices()
    assert len(devs) >= 8
    mesh = make_multislice_mesh(client=4, data=2, num_slices=2,
                                devices=devs[:8])
    assert mesh.shape == {"client": 4, "data": 2}
    arr = np.asarray(mesh.devices)
    slice_of = {d: (0 if i < 4 else 1) for i, d in enumerate(devs[:8])}
    # rows 0-1 (clients 0,1) on slice 0; rows 2-3 on slice 1
    for row in range(4):
        slices = {slice_of[d] for d in arr[row]}
        assert len(slices) == 1, f"client {row} spans slices {slices}"
    assert {slice_of[arr[row][0]] for row in range(2)} == {0}
    assert {slice_of[arr[row][0]] for row in range(2, 4)} == {1}


def test_multislice_mesh_validation():
    devs = jax.devices()
    with pytest.raises(ValueError, match="multiple of the slice count"):
        make_multislice_mesh(client=3, data=1, num_slices=2, devices=devs[:8])
    with pytest.raises(ValueError, match="slice has"):
        make_multislice_mesh(client=2, data=8, num_slices=2, devices=devs[:8])
    with pytest.raises(ValueError, match="split into"):
        make_multislice_mesh(client=2, data=1, num_slices=3, devices=devs[:8])


def test_engine_compressed_round_on_multislice_mesh_matches_no_mesh():
    """GSPMD correctness: the compressed aggregate over a client axis laid
    out across two simulated slices equals the single-device round."""
    plain = _engine(seed=0)
    plain.fcfg = dataclasses.replace(plain.fcfg, compress_bits=8)
    plain.run_rounds(stage=2, num_rounds=1)

    meshed = _engine(seed=0)
    meshed.fcfg = dataclasses.replace(
        meshed.fcfg, compress_bits=8,
        mesh=make_multislice_mesh(client=2, data=2, num_slices=2))
    meshed.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5),  # GSPMD reduction-order fp noise
        plain.global_params, meshed.global_params)
