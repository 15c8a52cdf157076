"""Numerical parity tests for ops vs torch reference implementations.

Each test re-implements the reference's torch math locally (from the
published formulas) and checks our JAX ops against it. Reference locations
are cited in the op docstrings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from privacy_preserve_federated_asr_tpu.ops import (
    am_softmax_loss,
    cross_entropy_loss,
    ctc_loss,
    fsm_attention_loss,
    gradient_reversal,
    gumbel_softmax,
    recall_family_loss,
)


def test_grl_forward_identity_and_backward_negation():
    x = jnp.array([1.0, -2.0, 3.0])
    lam = 0.5
    y = gradient_reversal(x, lam)
    np.testing.assert_allclose(y, x)

    g = jax.grad(lambda x: jnp.sum(gradient_reversal(x, lam) * jnp.array([1.0, 2.0, 3.0])))(x)
    np.testing.assert_allclose(g, -lam * np.array([1.0, 2.0, 3.0]), rtol=1e-6)


def test_gumbel_softmax_hard_is_onehot_with_soft_gradient():
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 16, 2))

    hard = gumbel_softmax(rng, logits, tau=0.7, hard=True)
    np.testing.assert_allclose(np.sum(np.asarray(hard), axis=-1), 1.0, rtol=1e-6)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}

    # straight-through: gradient equals the soft sample's gradient
    def f_hard(l):
        return jnp.sum(gumbel_softmax(rng, l, tau=0.7, hard=True) * jnp.arange(2.0))

    def f_soft(l):
        return jnp.sum(gumbel_softmax(rng, l, tau=0.7, hard=False) * jnp.arange(2.0))

    g_hard = jax.grad(f_hard)(logits)
    g_soft = jax.grad(f_soft)(logits)
    np.testing.assert_allclose(np.asarray(g_hard), np.asarray(g_soft), rtol=1e-5, atol=1e-6)


def test_gumbel_softmax_distribution_matches_softmax():
    # With many samples, mean of hard samples ~ softmax(logits / ~1) marginals.
    logits = jnp.array([[2.0, 0.0]])
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    samples = jax.vmap(lambda k: gumbel_softmax(k, logits, tau=1.0, hard=True))(keys)
    freq = np.mean(np.asarray(samples)[:, 0, 0])
    expected = float(jax.nn.softmax(logits)[0, 0])  # Gumbel-max gives exact softmax probs
    assert abs(freq - expected) < 0.03


@pytest.mark.parametrize("kind", ["recall", "prec", "f1", "recall_ori", "prec_ori"])
def test_recall_family_matches_torch_reference(kind):
    torch.manual_seed(0)
    n, c = 6, 2
    logits_t = torch.randn(n, c)
    labels_t = torch.randint(0, c, (n,))
    weight = [0.1, 0.9]

    # --- reference math (federated/src/models.py:187-260) ---
    logpt = F.log_softmax(logits_t, dim=1)
    pt = logpt.exp()
    target = labels_t.view(n, 1, -1)
    target_onehot = torch.zeros((n, c, 1)).scatter_(1, target, 1)
    tp = torch.sum(pt.view(n, c, 1) * target_onehot, dim=2)
    total_target = torch.sum(target_onehot, dim=2)
    recall = (tp + 1e-5) / (total_target + 1e-5)
    total_predict = torch.sum(pt.view(n, c, 1), dim=2)
    precision = (tp + 1e-5) / (total_predict + 1e-5)
    f1 = 2 * recall * precision / (recall + precision)
    w = torch.tensor(weight)
    w = w / w.sum()
    recall_ori = recall * w * c
    precision_ori = precision * w * c
    f1w = f1 * w * c
    recall_w = (torch.ones((n, c)) - recall) * w * c
    precision_w = (torch.ones((n, c)) - precision) * w * c
    expected = {
        "recall": recall_w.mean(),
        "prec": precision_w.mean(),
        "f1": 1 - f1w.mean(),
        "recall_ori": 1 - recall_ori.mean(),
        "prec_ori": 1 - precision_ori.mean(),
    }[kind].item()

    got = recall_family_loss(jnp.asarray(logits_t.numpy()), jnp.asarray(labels_t.numpy()), kind, weight)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5, atol=1e-6)


def test_cross_entropy_matches_torch():
    torch.manual_seed(1)
    logits_t = torch.randn(5, 2)
    labels_t = torch.randint(0, 2, (5,))
    expected = F.cross_entropy(logits_t, labels_t).item()
    got = cross_entropy_loss(jnp.asarray(logits_t.numpy()), jnp.asarray(labels_t.numpy()))
    np.testing.assert_allclose(float(got), expected, rtol=1e-6)


def test_am_softmax_matches_torch_reference():
    torch.manual_seed(2)
    n, d, c = 10, 16, 2
    x_t = torch.randn(n, d)
    labels_t = torch.randint(0, c, (n,))
    w_t = torch.randn(c, d)
    s, m = 30.0, 0.4

    # --- reference math (federated/src/models.py:161-185), cosface branch.
    # Note the reference's W-normalization loop is a no-op; only x is
    # normalized. wf = x_n @ W.T (no bias).
    xn = F.normalize(x_t, p=2, dim=1)
    wf = xn @ w_t.T
    numerator = s * (torch.diagonal(wf.transpose(0, 1)[labels_t]) - m)
    excl = torch.cat(
        [torch.cat((wf[i, :y], wf[i, y + 1:])).unsqueeze(0) for i, y in enumerate(labels_t)], dim=0
    )
    denominator = torch.exp(numerator) + torch.sum(torch.exp(s * excl), dim=1)
    expected = (-torch.mean(numerator - torch.log(denominator))).item()

    got, wf_j = am_softmax_loss(
        jnp.asarray(x_t.numpy()), jnp.asarray(labels_t.numpy()), jnp.asarray(w_t.numpy())
    )
    # exp(s * wf) with s=30 amplifies fp32 matmul noise by ~s, so loosen rtol
    np.testing.assert_allclose(float(got), expected, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(wf_j), wf.numpy(), rtol=1e-4, atol=1e-5)


def test_fsm_attention_loss_matches_torch_reference():
    torch.manual_seed(3)
    b, t, d = 3, 12, 8
    lm_t = torch.rand(b, t, d)
    ad_t = torch.rand(b, t, d)

    # --- reference math (centralized/Models.py:56-74) ---
    loss = 0.0
    for i in range(b):
        lm_mean = torch.mean(lm_t[i], dim=0)
        ad_mean = torch.mean(ad_t[i], dim=0)
        cos = torch.nn.CosineSimilarity(dim=0, eps=1e-6)
        s12 = cos(lm_mean, ad_mean)
        s21 = cos(ad_mean, lm_mean)
        S = torch.tensor([[0.0, s12], [s21, 0.0]])
        loss += torch.norm(S, p="fro")
    expected = (loss / b).item()

    got = fsm_attention_loss(jnp.asarray(lm_t.numpy()), jnp.asarray(ad_t.numpy()))
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
def test_ctc_loss_matches_torch(reduction):
    torch.manual_seed(4)
    bsz, t_max, vocab, l_max = 4, 50, 32, 12
    logits = torch.randn(bsz, t_max, vocab)
    log_probs = F.log_softmax(logits, dim=-1)
    input_lengths = torch.tensor([50, 43, 37, 29])
    label_lengths = torch.tensor([12, 7, 1, 10])
    labels = torch.randint(1, vocab, (bsz, l_max))

    flat = torch.cat([labels[i, : label_lengths[i]] for i in range(bsz)])
    expected = F.ctc_loss(
        log_probs.transpose(0, 1), flat, input_lengths, label_lengths,
        blank=0, reduction=reduction, zero_infinity=True,
    )

    got = ctc_loss(
        jnp.asarray(log_probs.numpy()), jnp.asarray(labels.numpy()),
        jnp.asarray(input_lengths.numpy()), jnp.asarray(label_lengths.numpy()),
        blank_id=0, reduction=reduction, zero_infinity=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-4, atol=1e-5)


def test_ctc_loss_gradient_matches_torch():
    torch.manual_seed(5)
    bsz, t_max, vocab, l_max = 2, 20, 8, 5
    logits = torch.randn(bsz, t_max, vocab, requires_grad=True)
    input_lengths = torch.tensor([20, 15])
    label_lengths = torch.tensor([5, 3])
    labels = torch.randint(1, vocab, (bsz, l_max))
    flat = torch.cat([labels[i, : label_lengths[i]] for i in range(bsz)])

    log_probs = F.log_softmax(logits, dim=-1)
    loss_t = F.ctc_loss(log_probs.transpose(0, 1), flat, input_lengths, label_lengths,
                        blank=0, reduction="sum", zero_infinity=True)
    loss_t.backward()

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, jnp.asarray(labels.numpy()), jnp.asarray(input_lengths.numpy()),
                        jnp.asarray(label_lengths.numpy()), blank_id=0, reduction="sum")

    g = jax.grad(loss_fn)(jnp.asarray(logits.detach().numpy()))
    np.testing.assert_allclose(np.asarray(g), logits.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_loss_zero_infinity_on_infeasible():
    # target longer than input frames -> impossible alignment
    bsz, t_max, vocab, l_max = 1, 4, 8, 4
    log_probs = jax.nn.log_softmax(jax.random.normal(jax.random.PRNGKey(0), (bsz, t_max, vocab)))
    labels = jnp.array([[1, 2, 3, 4]])
    got = ctc_loss(log_probs, labels, jnp.array([2]), jnp.array([4]), reduction="sum")
    assert float(got) == 0.0
    got_inf = ctc_loss(log_probs, labels, jnp.array([2]), jnp.array([4]),
                       reduction="none", zero_infinity=False)
    assert np.isinf(np.asarray(got_inf)).all()


def test_ctc_fast_path_matches_reference_path():
    """Custom-VJP alpha/beta CTC vs autodiff-through-scan, values + grads,
    mixed feasible/infeasible batch."""
    rng = np.random.default_rng(7)
    bsz, t_max, vocab, l_max = 5, 30, 16, 8
    logits = jnp.asarray(rng.normal(size=(bsz, t_max, vocab)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, vocab, size=(bsz, l_max)).astype(np.int32))
    input_lengths = jnp.array([30, 22, 17, 9, 3])   # last: infeasible (2*8+1 > 2*3)
    label_lengths = jnp.array([8, 5, 1, 4, 8])

    def loss(lg, fast):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(lp, labels, input_lengths, label_lengths,
                        reduction="sum", fast=fast)

    v_fast, g_fast = jax.value_and_grad(lambda lg: loss(lg, True))(logits)
    v_ref, g_ref = jax.value_and_grad(lambda lg: loss(lg, False))(logits)
    np.testing.assert_allclose(float(v_fast), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    assert np.isfinite(np.asarray(g_fast)).all()

    # 'none' reduction per-sample equality too
    ln_fast = ctc_loss(jax.nn.log_softmax(logits, -1), labels, input_lengths,
                       label_lengths, reduction="none", fast=True)
    ln_ref = ctc_loss(jax.nn.log_softmax(logits, -1), labels, input_lengths,
                      label_lengths, reduction="none", fast=False)
    np.testing.assert_allclose(np.asarray(ln_fast), np.asarray(ln_ref), rtol=1e-5)
    assert float(ln_fast[4]) == 0.0  # infeasible zeroed
