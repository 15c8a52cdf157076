"""End-to-end DACS parity: loss VALUE and GRADIENTS vs a torch
re-implementation of the reference forward equations
(federated/src/models.py:375-631), with identical injected Gumbel noise,
shared (ported) weights, tiny config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    DACSConfig,
    DACSModel,
    feat_extract_output_lengths,
    port_hf_state_dict,
)
from privacy_preserve_federated_asr_tpu.models.objectives import dacs_loss
from privacy_preserve_federated_asr_tpu.models.port import port_dacs_heads

LAM, TAU = 0.5, 0.9
B, T = 1, 3200
LABELS = np.array([[11, 5, 15, 15, 8, 4, 18, 8, 13, 15, 14]], dtype=np.int32)


class _RevGrad(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, lam):
        ctx.lam = lam
        return x.view_as(x)

    @staticmethod
    def backward(ctx, g):
        return -ctx.lam * g, None


class TorchDACS(tnn.Module):
    """The reference's stage-2 forward/loss, written out explicitly."""

    def __init__(self, hf_cfg):
        super().__init__()
        from transformers import Data2VecAudioModel

        d, v = hf_cfg.hidden_size, hf_cfg.vocab_size
        self.data2vec_audio = Data2VecAudioModel(hf_cfg)
        self.arbitrator = tnn.Linear(d, d * 4)
        self.lm_head = tnn.Linear(d, v)
        self.dementia_head = tnn.Linear(d, 2)
        self.criterion_similar = tnn.Module()
        self.criterion_similar.fc = tnn.Linear(d, 2, bias=False)
        self.d = d

    def forward(self, x, labels, dementia_labels, lm_noise, ad_noise):
        h = self.data2vec_audio(x).last_hidden_state
        d = self.d
        all_score = self.arbitrator(h)
        lm_score = torch.stack((all_score[..., :d], all_score[..., d:2*d]), -1)
        ad_score = torch.stack((all_score[..., 2*d:3*d], all_score[..., 3*d:]), -1)

        def gs(score, noise):
            y = (score + noise) / TAU
            y_soft = y.softmax(-1)
            index = y_soft.max(-1, keepdim=True)[1]
            y_hard = torch.zeros_like(score).scatter_(-1, index, 1.0)
            return (y_hard - y_soft.detach() + y_soft)[..., 0]

        lm_mask = gs(lm_score, lm_noise)
        ad_mask = gs(ad_score, ad_noise)
        lm_masked, ad_masked = lm_mask * h, ad_mask * h

        logits = self.lm_head(lm_masked)
        logits_r = self.lm_head(ad_masked)
        dementia_logits_lm = self.dementia_head(lm_masked)
        dementia_logits_ad = self.dementia_head(ad_masked)

        ad_mean_rev = _RevGrad.apply(torch.mean(dementia_logits_lm, dim=1), LAM)
        ad_mean = torch.mean(dementia_logits_ad, dim=1)

        t_frames = logits.shape[1]
        input_lengths = torch.full((x.shape[0],), t_frames, dtype=torch.long)
        target_lengths = torch.tensor([labels.shape[1]])
        flat = labels.flatten()
        lp = F.log_softmax(logits, dim=-1, dtype=torch.float32).transpose(0, 1)
        lp_r = F.log_softmax(logits_r, dim=-1, dtype=torch.float32).transpose(0, 1)
        lp_r = _RevGrad.apply(lp_r, LAM)
        loss = F.ctc_loss(lp, flat, input_lengths, target_lengths, blank=0,
                          reduction="sum", zero_infinity=True)
        loss_r = F.ctc_loss(lp_r, flat, input_lengths, target_lengths, blank=0,
                            reduction="sum", zero_infinity=True)
        dementia_loss_rev = F.cross_entropy(ad_mean_rev, dementia_labels)
        dementia_loss = F.cross_entropy(ad_mean, dementia_labels)

        # AM-softmax (cosface, reference :161-185 incl. no-op W normalization)
        rows = torch.cat(
            (lm_masked.reshape(-1, d), ad_masked.reshape(-1, d)), dim=0)
        am_labels = torch.cat(
            (torch.zeros(lm_masked.shape[1], dtype=torch.long),
             torch.ones(ad_masked.shape[1], dtype=torch.long)))
        xn = F.normalize(rows, p=2, dim=1)
        wf = self.criterion_similar.fc(xn)
        s, m = 30.0, 0.4
        numerator = s * (torch.diagonal(wf.transpose(0, 1)[am_labels]) - m)
        excl = torch.cat([torch.cat((wf[i, :y], wf[i, y+1:])).unsqueeze(0)
                          for i, y in enumerate(am_labels)], dim=0)
        denominator = torch.exp(numerator) + torch.sum(torch.exp(s * excl), dim=1)
        score_loss = -torch.mean(numerator - torch.log(denominator))

        return loss + dementia_loss_rev + loss_r + dementia_loss + score_loss


@pytest.fixture(scope="module")
def setup():
    from transformers import Data2VecAudioConfig

    cfg = BackboneConfig.tiny_for_tests()
    hf_cfg = Data2VecAudioConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        conv_pos_kernel_size=cfg.conv_pos_kernel_size,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        vocab_size=cfg.vocab_size,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    tmodel = TorchDACS(hf_cfg)
    tmodel.eval()  # dropout off; gumbel still sampled (injected)

    dcfg = DACSConfig(
        backbone=cfg.replace(hidden_dropout=0.0, attention_dropout=0.0,
                             activation_dropout=0.0, feat_proj_dropout=0.0,
                             final_dropout=0.0),
        stage=2, lambda_grl=LAM, gs_tau=TAU, ad_loss="cel",
        pool_valid_frames_only=False,
    )
    sd = tmodel.state_dict()
    params = {"backbone": port_hf_state_dict(sd, cfg, encoder_prefix="data2vec_audio.")}
    params.update(port_dacs_heads(sd))

    rng = np.random.default_rng(42)
    t_frames = feat_extract_output_lengths(cfg, T)
    d = cfg.hidden_size
    lm_noise = rng.gumbel(size=(B, t_frames, d, 2)).astype(np.float32)
    ad_noise = rng.gumbel(size=(B, t_frames, d, 2)).astype(np.float32)
    x = rng.normal(0, 1, size=(B, T)).astype(np.float32)
    dementia = np.array([1], dtype=np.int64)
    return tmodel, dcfg, params, x, lm_noise, ad_noise, dementia


def _jax_loss_fn(params, dcfg, x, lm_noise, ad_noise, dementia):
    model = DACSModel(dcfg)
    outputs = model.apply(
        {"params": params}, jnp.asarray(x),
        gumbel_noise=(jnp.asarray(lm_noise), jnp.asarray(ad_noise)),
        deterministic=True,
    )
    loss, metrics = dacs_loss(
        outputs, jnp.asarray(LABELS), jnp.array([LABELS.shape[1]]),
        jnp.asarray(dementia.astype(np.int32)), dcfg,
        params["similar_fc"]["kernel"],
    )
    return loss, metrics


def test_stage2_loss_value_parity(setup):
    tmodel, dcfg, params, x, lm_noise, ad_noise, dementia = setup
    with torch.no_grad():
        expected = tmodel(torch.tensor(x), torch.tensor(LABELS.astype(np.int64)),
                          torch.tensor(dementia), torch.tensor(lm_noise),
                          torch.tensor(ad_noise)).item()
    got, metrics = _jax_loss_fn(params, dcfg, x, lm_noise, ad_noise, dementia)
    np.testing.assert_allclose(float(got), expected, rtol=2e-3)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_stage2_gradient_parity(setup):
    tmodel, dcfg, params, x, lm_noise, ad_noise, dementia = setup
    loss_t = tmodel(torch.tensor(x), torch.tensor(LABELS.astype(np.int64)),
                    torch.tensor(dementia), torch.tensor(lm_noise),
                    torch.tensor(ad_noise))
    tmodel.zero_grad()
    loss_t.backward()

    grads = jax.grad(
        lambda p: _jax_loss_fn(p, dcfg, x, lm_noise, ad_noise, dementia)[0]
    )(params)

    pairs = [
        (tmodel.arbitrator.weight.grad.numpy().T, grads["arbitrator"]["kernel"]),
        (tmodel.lm_head.weight.grad.numpy().T, grads["lm_head"]["kernel"]),
        (tmodel.dementia_head.weight.grad.numpy().T, grads["dementia_head"]["kernel"]),
        (tmodel.criterion_similar.fc.weight.grad.numpy().T, grads["similar_fc"]["kernel"]),
    ]
    for theirs, ours in pairs:
        ours = np.asarray(ours)
        scale = np.maximum(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(ours / scale, theirs / scale, atol=5e-3)


def test_stage_routing(setup):
    tmodel, dcfg, params, x, lm_noise, ad_noise, dementia = setup
    losses = {}
    for stage in (0, 1, 2):
        cfg_s = dcfg.replace(stage=stage)
        loss, metrics = _jax_loss_fn(params, cfg_s, x, lm_noise, ad_noise, dementia)
        losses[stage] = float(loss)
        np.testing.assert_allclose(float(metrics["loss"]), float(loss))
    np.testing.assert_allclose(losses[0], losses[0])  # finite
    # stage 0 = unmasked CTC only; stage 1 = AD loss only; stage 2 = sum of 5
    _, m2 = _jax_loss_fn(params, dcfg.replace(stage=2), x, lm_noise, ad_noise, dementia)
    total = sum(float(m2[k]) for k in
                ["ctc_masked", "ad_reversed", "ctc_reversed", "ad_masked", "am_softmax"])
    np.testing.assert_allclose(losses[2], total, rtol=1e-6)


def test_masks_are_binary_and_shaped(setup):
    tmodel, dcfg, params, x, lm_noise, ad_noise, dementia = setup
    model = DACSModel(dcfg)
    out = model.apply({"params": params}, jnp.asarray(x),
                      rngs={"gumbel": jax.random.PRNGKey(0)}, deterministic=True)
    lm = np.asarray(out.lm_mask)
    assert set(np.unique(lm)) <= {0.0, 1.0}
    assert lm.shape == out.hidden_states.shape
    assert out.logits.shape[-1] == dcfg.backbone.vocab_size
    assert out.dementia_logits_ad.shape[-1] == 2
