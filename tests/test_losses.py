"""Golden-value tests for masked losses against torch reimplementations of the
reference math (flexynesis modules.py:265-305, direct_pred.py:146-223,
supervised_vae.py:494-550)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from flexynesis_tpu.ops import (
    compute_mmd,
    compute_total_loss,
    cox_ph_loss,
    masked_ce_loss,
    masked_mse_loss,
    triplet_margin_loss,
)


def torch_cox_ph_loss(outputs, durations, events):
    # torch transliteration of the reference Cox partial likelihood
    valid = ~torch.isnan(durations) & ~torch.isnan(events)
    outputs, events, durations = outputs[valid], events[valid], durations[valid]
    hazards = torch.exp(outputs)
    idx = torch.argsort(durations, descending=True)
    log_risk = torch.log(torch.cumsum(hazards[idx], dim=0))
    ev = events[idx]
    uncensored = torch.sum(outputs[idx][ev == 1]) - torch.sum(log_risk[ev == 1])
    return -uncensored / torch.sum(events)


class TestMaskedMSE:
    def test_matches_torch(self, rng):
        y = rng.normal(size=32).astype(np.float32)
        y_hat = rng.normal(size=32).astype(np.float32)
        y[[3, 7, 20]] = np.nan
        ours = masked_mse_loss(jnp.array(y_hat), jnp.array(y))
        mask = ~np.isnan(y)
        theirs = F.mse_loss(torch.tensor(y_hat[mask]), torch.tensor(y[mask]))
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)

    def test_all_missing_is_zero(self):
        y = jnp.full((8,), jnp.nan)
        assert float(masked_mse_loss(jnp.ones(8), y)) == 0.0

    def test_gradient_finite_with_nans(self):
        y = jnp.array([1.0, jnp.nan, 2.0])
        g = jax.grad(lambda p: masked_mse_loss(p, y))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(g[1]) == 0.0  # masked entry contributes no gradient


class TestMaskedCE:
    def test_matches_torch(self, rng):
        logits = rng.normal(size=(16, 4)).astype(np.float32)
        y = rng.integers(0, 4, size=16).astype(np.float32)
        y[[0, 5]] = -1
        ours = masked_ce_loss(jnp.array(logits), jnp.array(y))
        mask = y != -1
        theirs = F.cross_entropy(
            torch.tensor(logits[mask]), torch.tensor(y[mask]).long()
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_all_missing_is_zero(self):
        logits = jnp.ones((4, 3))
        y = jnp.full((4,), -1.0)
        assert float(masked_ce_loss(logits, y)) == 0.0


class TestCoxPH:
    def test_matches_torch(self, rng):
        n = 40
        out = rng.normal(size=n).astype(np.float32)
        dur = rng.exponential(10.0, size=n).astype(np.float32)
        ev = rng.integers(0, 2, size=n).astype(np.float32)
        dur[[2, 9]] = np.nan
        ours = cox_ph_loss(jnp.array(out), jnp.array(dur), jnp.array(ev))
        theirs = torch_cox_ph_loss(
            torch.tensor(out), torch.tensor(dur), torch.tensor(ev)
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)

    def test_no_events_is_zero(self):
        out = jnp.zeros(8)
        dur = jnp.arange(8.0)
        ev = jnp.zeros(8)
        assert float(cox_ph_loss(out, dur, ev)) == 0.0

    def test_all_nan_is_zero(self):
        out = jnp.zeros(4)
        nanv = jnp.full((4,), jnp.nan)
        assert float(cox_ph_loss(out, nanv, nanv)) == 0.0

    def test_grad_finite(self, rng):
        n = 16
        dur = jnp.array(rng.exponential(5.0, size=n).astype(np.float32))
        ev = jnp.array(rng.integers(0, 2, size=n).astype(np.float32))
        g = jax.grad(lambda o: cox_ph_loss(o, dur, ev))(jnp.zeros(n))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_finite_on_degenerate_batches(self):
        """A where() fixing only the forward value would still leak NaN
        cotangents through log(cumsum=0); these batches must yield finite
        (zero where appropriate) gradients, like the reference's detached
        0.0 guard (modules.py:303-305)."""
        n = 8
        # 1) every row NaN duration/event (sparse survival annotation)
        nanv = jnp.full((n,), jnp.nan)
        g = jax.grad(lambda o: cox_ph_loss(o, nanv, nanv))(jnp.ones(n))
        np.testing.assert_array_equal(np.asarray(g), 0.0)
        # 2) risk spread > 88 nats: first hazard underflows to 0 in f32
        dur = jnp.arange(n, 0, -1).astype(jnp.float32)
        ev = jnp.ones(n)
        out = jnp.array([-200.0, 0.0, 1.0, 2.0, -1.0, 0.5, 0.0, 3.0])
        val, g = jax.value_and_grad(
            lambda o: cox_ph_loss(o, dur, ev)
        )(out)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))
        # 3) NaN model outputs (broken step): loss 0, gradients finite
        out_nan = jnp.full((n,), jnp.nan)
        val, g = jax.value_and_grad(
            lambda o: cox_ph_loss(o, dur, ev)
        )(out_nan)
        assert float(val) == 0.0
        assert np.all(np.isfinite(np.asarray(g)))
        # 4) a single NaN output row must not poison the others' gradients
        out_mixed = out.at[3].set(jnp.nan)
        val, g = jax.value_and_grad(
            lambda o: cox_ph_loss(o, dur, ev)
        )(out_mixed)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(g)))


class TestTotalLoss:
    def test_uncertainty_weighting(self):
        losses = {"a": jnp.array(1.0), "b": jnp.array(2.0)}
        log_vars = {"a": jnp.array([0.5]), "b": jnp.array([-0.3])}
        total = compute_total_loss(losses, log_vars, use_loss_weighting=True)
        expected = (
            np.exp(-0.5) * 1.0 + 0.5 + np.exp(0.3) * 2.0 - 0.3
        )
        np.testing.assert_allclose(float(total), expected, rtol=1e-6)

    def test_single_loss_unweighted(self):
        losses = {"a": jnp.array(3.0)}
        log_vars = {"a": jnp.array([9.0])}
        assert float(compute_total_loss(losses, log_vars, True)) == 3.0


class TestMMD:
    def test_matches_torch_formula(self, rng):
        x = rng.normal(size=(20, 8)).astype(np.float32)
        y = rng.normal(size=(12, 8)).astype(np.float32)

        def torch_kernel(a, b):
            a, b = torch.tensor(a), torch.tensor(b)
            d = a.shape[1]
            diff = (a.unsqueeze(1) - b.unsqueeze(0)).pow(2).mean(2) / float(d)
            return torch.exp(-diff)

        theirs = (
            torch_kernel(x, x).mean()
            + torch_kernel(y, y).mean()
            - 2 * torch_kernel(x, y).mean()
        )
        ours = compute_mmd(jnp.array(x), jnp.array(y))
        # the ||x||^2+||y||^2-2xy expansion trades ~1e-3 relative f32 accuracy
        # for a single MXU matmul; MMD is a training signal, not a reported metric
        np.testing.assert_allclose(float(ours), float(theirs), rtol=5e-3, atol=1e-5)


class TestTriplet:
    def test_matches_torch(self, rng):
        a = rng.normal(size=(10, 6)).astype(np.float32)
        p = rng.normal(size=(10, 6)).astype(np.float32)
        n = rng.normal(size=(10, 6)).astype(np.float32)
        ours = triplet_margin_loss(jnp.array(a), jnp.array(p), jnp.array(n))
        theirs = torch.nn.TripletMarginLoss(margin=1.0)(
            torch.tensor(a), torch.tensor(p), torch.tensor(n)
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-3, atol=1e-4)


class TestModules:
    def test_mlp_shapes_and_bias_free_regression(self):
        from flexynesis_tpu.ops import MLP

        m = MLP(hidden_dim=16, output_dim=1)
        x = jnp.ones((4, 10))
        variables = m.init(jax.random.key(0), x, train=False)
        out = m.apply(variables, x, train=False)
        assert out.shape == (4, 1)
        assert "bias" not in variables["params"]["layer_out"]

        m2 = MLP(hidden_dim=16, output_dim=3)
        v2 = m2.init(jax.random.key(0), x, train=False)
        assert "bias" in v2["params"]["layer_out"]
        assert m2.apply(v2, x, train=False).shape == (4, 3)

    def test_mlp_hidden_clamped_to_two(self):
        from flexynesis_tpu.ops import MLP

        m = MLP(hidden_dim=1, output_dim=2)
        v = m.init(jax.random.key(0), jnp.ones((2, 5)), train=False)
        assert v["params"]["layer_1"]["kernel"].shape == (5, 2)

    def test_encoder_decoder_roundtrip_shapes(self):
        from flexynesis_tpu.ops import Decoder, Encoder

        enc = Encoder(hidden_dims=[32], latent_dim=8)
        x = jnp.ones((6, 20))
        v = enc.init(jax.random.key(1), x, train=False)
        mean, log_var = enc.apply(v, x, train=False)
        assert mean.shape == (6, 8) and log_var.shape == (6, 8)

        dec = Decoder(hidden_dims=[32], output_dim=20)
        vd = dec.init(jax.random.key(2), mean, train=False)
        xhat = dec.apply(vd, mean, train=False)
        assert xhat.shape == (6, 20)
        assert float(jnp.min(xhat)) >= 0.0 and float(jnp.max(xhat)) <= 1.0

    def test_batchnorm_running_stats_update(self):
        from flexynesis_tpu.ops import MLP

        m = MLP(hidden_dim=8, output_dim=2)
        x = jnp.array(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
        v = m.init(jax.random.key(0), x, train=True)
        _, updates = m.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        before = v["batch_stats"]["batchnorm"]["mean"]
        after = updates["batch_stats"]["batchnorm"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))
