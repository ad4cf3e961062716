"""Numerical parity with the PyTorch reference architecture.

The reference implementation itself cannot run here (torch_geometric /
lightning / captum are not installed), so parity is demonstrated at the
math level: the DirectPred forward is rebuilt in raw torch with the SAME
trained weights copied from the Flax model — outputs must match to f32
tolerance (BASELINE.md: 'bitwise-comparable predictions ... practically a
tight f32 tolerance')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from flexynesis_tpu.data.dataset import MultiOmicDataset
from flexynesis_tpu.models.direct_pred import DirectPred


def make_ds(rng, n=32, gex=50, cnv=30, k=3):
    cls = rng.integers(0, k, n).astype(np.float32)
    return MultiOmicDataset(
        dat={
            "gex": rng.normal(size=(n, gex)).astype(np.float32),
            "cnv": rng.normal(size=(n, cnv)).astype(np.float32),
        },
        ann={"subtype": cls},
        variable_types={"subtype": "categorical"},
        features={
            "gex": [f"g{i}" for i in range(gex)],
            "cnv": [f"c{i}" for i in range(cnv)],
        },
        samples=[f"S{i}" for i in range(n)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(k)}},
    )


class TorchMLP(nn.Module):
    """Reference modules.py:106-150 math in raw torch."""

    def __init__(self, input_dim, hidden_dim, output_dim):
        super().__init__()
        hidden_dim = max(hidden_dim, 2)
        self.layer_1 = nn.Linear(input_dim, hidden_dim)
        self.layer_out = (
            nn.Linear(hidden_dim, output_dim)
            if output_dim > 1
            else nn.Linear(hidden_dim, 1, bias=False)
        )
        self.batchnorm = nn.BatchNorm1d(hidden_dim)

    def forward(self, x):
        x = torch.relu(self.batchnorm(self.layer_1(x)))
        return self.layer_out(x)  # dropout inactive in eval


def copy_mlp(torch_mlp, flax_params, flax_stats):
    with torch.no_grad():
        torch_mlp.layer_1.weight.copy_(
            torch.tensor(np.asarray(flax_params["layer_1"]["kernel"]).T)
        )
        torch_mlp.layer_1.bias.copy_(
            torch.tensor(np.asarray(flax_params["layer_1"]["bias"]))
        )
        torch_mlp.batchnorm.weight.copy_(
            torch.tensor(np.asarray(flax_params["batchnorm"]["scale"]))
        )
        torch_mlp.batchnorm.bias.copy_(
            torch.tensor(np.asarray(flax_params["batchnorm"]["bias"]))
        )
        torch_mlp.batchnorm.running_mean.copy_(
            torch.tensor(np.asarray(flax_stats["batchnorm"]["mean"]))
        )
        torch_mlp.batchnorm.running_var.copy_(
            torch.tensor(np.asarray(flax_stats["batchnorm"]["var"]))
        )
        torch_mlp.layer_out.weight.copy_(
            torch.tensor(np.asarray(flax_params["layer_out"]["kernel"]).T)
        )
        if torch_mlp.layer_out.bias is not None:
            torch_mlp.layer_out.bias.copy_(
                torch.tensor(np.asarray(flax_params["layer_out"]["bias"]))
            )


class TestDirectPredParity:
    def test_forward_matches_torch_reference(self, rng):
        ds = make_ds(rng)
        cfg = {
            "latent_dim": 16, "hidden_dim_factor": 0.4, "lr": 1e-3,
            "supervisor_hidden_dim": 8, "epochs": 5, "batch_size": 16,
        }
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        # briefly train so batch_stats are non-trivial
        model.fit(ds, np.arange(24), np.arange(24, 32), lr=1e-3,
                  batch_size=16, max_epochs=3)

        p, s = model.params, model.batch_stats

        enc_gex = TorchMLP(50, int(50 * 0.4), 16)
        enc_cnv = TorchMLP(30, int(30 * 0.4), 16)
        copy_mlp(enc_gex, p["encoder_gex"], s["encoder_gex"])
        copy_mlp(enc_cnv, p["encoder_cnv"], s["encoder_cnv"])
        fusion = nn.Linear(32, 16)
        with torch.no_grad():
            fusion.weight.copy_(
                torch.tensor(np.asarray(p["fusion_block"]["kernel"]).T)
            )
            fusion.bias.copy_(torch.tensor(np.asarray(p["fusion_block"]["bias"])))
        head = TorchMLP(16, 8, model.output_dims["subtype"])
        copy_mlp(head, p["head_subtype"], s["head_subtype"])

        enc_gex.eval(), enc_cnv.eval(), fusion.eval(), head.eval()
        with torch.no_grad():
            z = fusion(
                torch.cat(
                    [
                        enc_gex(torch.tensor(ds.dat["gex"])),
                        enc_cnv(torch.tensor(ds.dat["cnv"])),
                    ],
                    dim=1,
                )
            )
            torch_logits = head(z).numpy()

        out = model._forward_eval(model.make_eval_x(ds))
        flax_logits = np.asarray(out["outputs"]["subtype"])
        np.testing.assert_allclose(
            flax_logits, torch_logits, rtol=1e-4, atol=1e-5
        )
        # embeddings match too
        np.testing.assert_allclose(
            np.asarray(out["embeddings"]), z.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_init_distributions_match_torch(self, rng):
        """Fresh kernels follow torch's U(+-1/sqrt(fan_in)) law."""
        ds = make_ds(rng, gex=400, cnv=100)
        cfg = {
            "latent_dim": 64, "hidden_dim_factor": 0.5, "lr": 1e-3,
            "supervisor_hidden_dim": 16, "epochs": 1, "batch_size": 16,
        }
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        model.init_params(ds, seed=0)
        k = np.asarray(model.params["encoder_gex"]["layer_1"]["kernel"])
        bound = 1.0 / np.sqrt(400)
        assert abs(float(k.max()) - bound) < bound * 0.05
        assert abs(float(k.min()) + bound) < bound * 0.05
        # uniform distribution: std ~= bound / sqrt(3)
        np.testing.assert_allclose(k.std(), bound / np.sqrt(3), rtol=0.05)


class TestVAEBlockParity:
    def test_encoder_decoder_match_torch(self, rng):
        """Flax Encoder/Decoder stacks with copied weights match the
        reference's torch math (modules.py:10-103) in eval mode."""
        from flexynesis_tpu.ops import Decoder, Encoder

        B, D_IN, H, LAT = 12, 30, 14, 8
        x_np = rng.normal(size=(B, D_IN)).astype(np.float32)

        enc = Encoder(hidden_dims=[H], latent_dim=LAT)
        v = enc.init(jax.random.key(0), jnp.array(x_np), train=False)
        p, s = v["params"], v["batch_stats"]

        class TorchEnc(nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = nn.Linear(D_IN, H)
                self.bn = nn.BatchNorm1d(H)
                self.mean = nn.Linear(H, LAT)
                self.var = nn.Linear(H, LAT)

            def forward(self, x):
                h = self.bn(torch.nn.functional.leaky_relu(self.lin(x), 0.2))
                return self.mean(h), self.var(h)

        t = TorchEnc()
        hp = p["hidden_layers"]
        with torch.no_grad():
            t.lin.weight.copy_(torch.tensor(np.asarray(hp["dense_0"]["kernel"]).T))
            t.lin.bias.copy_(torch.tensor(np.asarray(hp["dense_0"]["bias"])))
            t.bn.weight.copy_(
                torch.tensor(np.asarray(hp["bn_0"]["scale"]))
            )
            t.bn.bias.copy_(torch.tensor(np.asarray(hp["bn_0"]["bias"])))
            t.bn.running_mean.copy_(
                torch.tensor(np.asarray(s["hidden_layers"]["bn_0"]["mean"]))
            )
            t.bn.running_var.copy_(
                torch.tensor(np.asarray(s["hidden_layers"]["bn_0"]["var"]))
            )
            t.mean.weight.copy_(torch.tensor(np.asarray(p["FC_mean"]["kernel"]).T))
            t.mean.bias.copy_(torch.tensor(np.asarray(p["FC_mean"]["bias"])))
            t.var.weight.copy_(torch.tensor(np.asarray(p["FC_var"]["kernel"]).T))
            t.var.bias.copy_(torch.tensor(np.asarray(p["FC_var"]["bias"])))
        t.eval()

        mean_f, logvar_f = enc.apply(v, jnp.array(x_np), train=False)
        with torch.no_grad():
            mean_t, logvar_t = t(torch.tensor(x_np))
        np.testing.assert_allclose(
            np.asarray(mean_f), mean_t.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(logvar_f), logvar_t.numpy(), rtol=1e-4, atol=1e-5
        )

        # decoder: sigmoid output head
        from flexynesis_tpu.ops import Decoder

        dec = Decoder(hidden_dims=[H], output_dim=D_IN)
        vd = dec.init(jax.random.key(1), jnp.array(np.asarray(mean_f)), train=False)
        pd_, sd = vd["params"], vd["batch_stats"]

        class TorchDec(nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = nn.Linear(LAT, H)
                self.bn = nn.BatchNorm1d(H)
                self.out = nn.Linear(H, D_IN)

            def forward(self, z):
                h = self.bn(torch.nn.functional.leaky_relu(self.lin(z), 0.2))
                return torch.sigmoid(self.out(h))

        td = TorchDec()
        hp = pd_["hidden_layers"]
        with torch.no_grad():
            td.lin.weight.copy_(torch.tensor(np.asarray(hp["dense_0"]["kernel"]).T))
            td.lin.bias.copy_(torch.tensor(np.asarray(hp["dense_0"]["bias"])))
            td.bn.weight.copy_(torch.tensor(np.asarray(hp["bn_0"]["scale"])))
            td.bn.bias.copy_(torch.tensor(np.asarray(hp["bn_0"]["bias"])))
            td.bn.running_mean.copy_(
                torch.tensor(np.asarray(sd["hidden_layers"]["bn_0"]["mean"]))
            )
            td.bn.running_var.copy_(
                torch.tensor(np.asarray(sd["hidden_layers"]["bn_0"]["var"]))
            )
            td.out.weight.copy_(torch.tensor(np.asarray(pd_["FC_output"]["kernel"]).T))
            td.out.bias.copy_(torch.tensor(np.asarray(pd_["FC_output"]["bias"])))
        td.eval()

        xhat_f = dec.apply(vd, jnp.array(np.asarray(mean_f)), train=False)
        with torch.no_grad():
            xhat_t = td(mean_t)
        np.testing.assert_allclose(
            np.asarray(xhat_f), xhat_t.numpy(), rtol=1e-4, atol=1e-5
        )


class TestIGParity:
    def test_integrated_gradients_matches_torch_autograd(self, rng):
        """IG with Gauss-Legendre nodes (captum's default quadrature) computed
        through torch autograd on a weight-copied replica must match the JAX
        attribution engine."""
        from flexynesis_tpu.interpret.attribution import (
            _gauss_legendre,
            integrated_gradients,
        )

        ds = make_ds(rng, n=12)
        cfg = {
            "latent_dim": 16, "hidden_dim_factor": 0.4, "lr": 1e-3,
            "supervisor_hidden_dim": 8, "epochs": 3, "batch_size": 8,
        }
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        model.fit(ds, np.arange(9), np.arange(9, 12), lr=1e-3,
                  batch_size=8, max_epochs=2)
        p, s = model.params, model.batch_stats

        # torch replica with copied weights (eval mode)
        enc_gex = TorchMLP(50, int(50 * 0.4), 16)
        enc_cnv = TorchMLP(30, int(30 * 0.4), 16)
        copy_mlp(enc_gex, p["encoder_gex"], s["encoder_gex"])
        copy_mlp(enc_cnv, p["encoder_cnv"], s["encoder_cnv"])
        fusion = nn.Linear(32, 16)
        with torch.no_grad():
            fusion.weight.copy_(torch.tensor(np.asarray(p["fusion_block"]["kernel"]).T))
            fusion.bias.copy_(torch.tensor(np.asarray(p["fusion_block"]["bias"])))
        head = TorchMLP(16, 8, model.output_dims["subtype"])
        copy_mlp(head, p["head_subtype"], s["head_subtype"])
        for m in (enc_gex, enc_cnv, fusion, head):
            m.eval()

        def torch_forward(a, b):
            return head(fusion(torch.cat([enc_gex(a), enc_cnv(b)], dim=1)))

        target_class = 1
        n_steps = 8
        alphas, weights = _gauss_legendre(n_steps)
        xg = torch.tensor(ds.dat["gex"])
        xc = torch.tensor(ds.dat["cnv"])
        acc_g = torch.zeros_like(xg)
        acc_c = torch.zeros_like(xc)
        for a_k, w_k in zip(alphas, weights):
            ag = (float(a_k) * xg).clone().requires_grad_(True)
            ac = (float(a_k) * xc).clone().requires_grad_(True)
            out = torch_forward(ag, ac)[:, target_class].sum()
            gg, gc = torch.autograd.grad(out, (ag, ac))
            acc_g += float(w_k) * gg
            acc_c += float(w_k) * gc
        torch_attr_g = (xg * acc_g).detach().numpy()
        torch_attr_c = (xc * acc_c).detach().numpy()

        def forward(x):
            return model._attribution_forward(p, s, x, "subtype")

        x = model.make_eval_x(ds)
        ours = integrated_gradients(forward, x, target_class, n_steps, False)
        np.testing.assert_allclose(
            np.asarray(ours["gex"]), torch_attr_g, rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours["cnv"]), torch_attr_c, rtol=1e-3, atol=1e-5
        )


class TestGradientShapParity:
    def test_gradient_shap_matches_torch_autograd(self, rng):
        """GradientShap (zero baselines, stdevs=0 — the reference CLI's
        settings, direct_pred.py:499-561) vs torch autograd on a
        weight-copied replica. Parity is EXACT, not statistical: the test
        reproduces the engine's jax.random key schedule to extract the
        per-(sample, draw) uniform path scales, then drives the torch
        replica with those same scales — both sides compute
        mean_k[ x * grad f(u_k * x) ] over identical u_k."""
        from flexynesis_tpu.interpret.attribution import gradient_shap

        ds = make_ds(rng, n=12)
        cfg = {
            "latent_dim": 16, "hidden_dim_factor": 0.4, "lr": 1e-3,
            "supervisor_hidden_dim": 8, "epochs": 3, "batch_size": 8,
        }
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        model.fit(ds, np.arange(9), np.arange(9, 12), lr=1e-3,
                  batch_size=8, max_epochs=2)
        p, s = model.params, model.batch_stats

        enc_gex = TorchMLP(50, int(50 * 0.4), 16)
        enc_cnv = TorchMLP(30, int(30 * 0.4), 16)
        copy_mlp(enc_gex, p["encoder_gex"], s["encoder_gex"])
        copy_mlp(enc_cnv, p["encoder_cnv"], s["encoder_cnv"])
        fusion = nn.Linear(32, 16)
        with torch.no_grad():
            fusion.weight.copy_(torch.tensor(np.asarray(p["fusion_block"]["kernel"]).T))
            fusion.bias.copy_(torch.tensor(np.asarray(p["fusion_block"]["bias"])))
        head = TorchMLP(16, 8, model.output_dims["subtype"])
        copy_mlp(head, p["head_subtype"], s["head_subtype"])
        for m in (enc_gex, enc_cnv, fusion, head):
            m.eval()

        def torch_forward(a, b):
            return head(fusion(torch.cat([enc_gex(a), enc_cnv(b)], dim=1)))

        target_class = 2
        n_samples = 6
        x = model.make_eval_x(ds)
        seed_key = jax.random.key(7)

        # our attribution
        def forward(xs):
            return model._attribution_forward(p, s, xs, "subtype")

        ours = gradient_shap(forward, x, target_class, n_samples, False,
                             seed_key)

        # reproduce the engine's key schedule (attribution.py::gradient_shap)
        # to obtain the identical per-(sample, draw) uniform path scale —
        # ONE scale shared across layers, Captum's rand_coefficient scheme
        keys = jax.random.split(seed_key, n_samples)
        n_batch = next(iter(x.values())).shape[0]
        u_draws = []
        for key in keys:
            ku, _ = jax.random.split(key)
            u_draws.append(
                np.asarray(jax.random.uniform(ku, (n_batch, 1)))
            )

        xg = torch.tensor(ds.dat["gex"])
        xc = torch.tensor(ds.dat["cnv"])
        acc_g = torch.zeros_like(xg)
        acc_c = torch.zeros_like(xc)
        for u in u_draws:
            ut = torch.tensor(u)
            ag = (ut * xg).clone().requires_grad_(True)
            ac = (ut * xc).clone().requires_grad_(True)
            out = torch_forward(ag, ac)[:, target_class].sum()
            gg, gc = torch.autograd.grad(out, (ag, ac))
            acc_g += xg * gg
            acc_c += xc * gc
        torch_attr_g = (acc_g / n_samples).numpy()
        torch_attr_c = (acc_c / n_samples).numpy()

        np.testing.assert_allclose(
            np.asarray(ours["gex"]), torch_attr_g, rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours["cnv"]), torch_attr_c, rtol=1e-3, atol=1e-5
        )
