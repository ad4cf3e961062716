"""Heterogeneous-architecture trial padding: the masked max-dim network must
compute EXACTLY the smaller architecture's function, and mixed-dim rounds
must train concurrently."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexynesis_tpu.data.dataset import MultiOmicDataset
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.parallel.hetero import (
    build_padded_trials,
    directpred_trial_mask,
    max_config,
)


def make_ds(rng, n=48, gex=40, cnv=20, k=3):
    cls = rng.integers(0, k, n).astype(np.float32)
    return MultiOmicDataset(
        dat={
            "gex": (rng.normal(size=(n, gex)) + cls[:, None]).astype(np.float32),
            "cnv": (rng.normal(size=(n, cnv)) + cls[:, None]).astype(np.float32),
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


def small_cfg(**kw):
    cfg = {
        "latent_dim": 16, "hidden_dim_factor": 0.3, "lr": 0.01,
        "supervisor_hidden_dim": 8, "epochs": 10, "batch_size": 16,
    }
    cfg.update(kw)
    return cfg


def embed_params(small, template, mask, n_mod=2):
    """Copy the small architecture's params into the padded template layout.

    The fusion block needs block-wise placement: modality m's latent rows
    live at [m*L_max, m*L_max + L_small) in the padded concat, not at
    [m*L_small, ...).
    """

    def place(s, t, m):
        out = np.zeros_like(np.asarray(t))
        s = np.asarray(s)
        sl = tuple(slice(0, d) for d in s.shape)
        out[sl] = s
        return out * np.asarray(m)

    embedded = jax.tree.map(place, small, template, mask)
    if "fusion_block" in small:
        k_small = np.asarray(small["fusion_block"]["kernel"])
        k_t = np.asarray(template["fusion_block"]["kernel"])
        L_small = k_small.shape[1]
        L_max = k_t.shape[1]
        out = np.zeros_like(k_t)
        for m in range(n_mod):
            out[m * L_max : m * L_max + L_small, :L_small] = k_small[
                m * L_small : (m + 1) * L_small
            ]
        embedded["fusion_block"]["kernel"] = out * np.asarray(
            mask["fusion_block"]["kernel"]
        )
    return embedded


class TestPaddedEquivalence:
    def test_masked_padded_forward_equals_exact(self, rng):
        ds = make_ds(rng)
        cfg_small = small_cfg()
        cfg_big = small_cfg(latent_dim=32, hidden_dim_factor=0.5,
                            supervisor_hidden_dim=16)

        exact = DirectPred(cfg_small, ds, target_variables=["subtype"])
        exact.init_params(ds, seed=7)
        padded = DirectPred(cfg_big, ds, target_variables=["subtype"])
        padded.init_params(ds, seed=7)

        mask, _ = directpred_trial_mask(
            jax.tree.map(np.asarray, padded.params),
            cfg_small, exact.layers, exact.input_dims,
        )
        # structures line up leaf-for-leaf
        assert jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(
            jax.tree.map(np.asarray, padded.params)
        )

        padded.params = embed_params(exact.params, padded.params, mask)
        x = exact.make_eval_x(ds)
        out_exact = exact._forward_eval(x)["outputs"]["subtype"]
        out_padded = padded._forward_eval(x)["outputs"]["subtype"]
        np.testing.assert_allclose(
            np.asarray(out_exact), np.asarray(out_padded), rtol=1e-5, atol=1e-6
        )

    def test_masked_gradients_stay_in_active_region(self, rng):
        ds = make_ds(rng)
        cfg_small = small_cfg()
        cfg_big = small_cfg(latent_dim=32, supervisor_hidden_dim=16)
        padded = DirectPred(cfg_big, ds, target_variables=["subtype"])
        padded.init_params(ds, seed=3)
        mask, _ = directpred_trial_mask(
            jax.tree.map(np.asarray, padded.params),
            cfg_small, padded.layers, padded.input_dims,
        )
        padded.params = jax.tree.map(
            lambda p, m: p * jnp.asarray(m), padded.params, mask
        )
        batch = padded.make_batch(ds, np.arange(16))
        grads = jax.grad(
            lambda p: padded.loss_fn(p, padded.batch_stats, batch,
                                     jax.random.key(0), True)[0]
        )(padded.params)
        # masked updates (grad * mask) leave padded regions untouched;
        # with zeroed padded params the forward is exactly the small net
        masked = jax.tree.map(lambda g, m: np.asarray(g) * (1 - np.asarray(m)),
                              grads, mask)
        # padded-region activations are zero, so their grads must not leak
        # into ACTIVE-region outputs: verify loss only depends on active dims
        # by perturbing a padded weight and recomputing
        p2 = jax.tree.map(lambda a: a, padded.params)
        k = np.array(p2["encoder_gex"]["layer_out"]["kernel"], copy=True)
        k[:, -1] = 99.0  # padded latent column (latent 16 -> 32 here)
        p2["encoder_gex"]["layer_out"]["kernel"] = jnp.asarray(
            k * np.asarray(mask["encoder_gex"]["layer_out"]["kernel"])
        )
        l1 = float(padded.loss_fn(padded.params, padded.batch_stats, batch,
                                  jax.random.key(0), True)[0])
        l2 = float(padded.loss_fn(p2, padded.batch_stats, batch,
                                  jax.random.key(0), True)[0])
        assert abs(l1 - l2) < 1e-6

    def test_hetero_round_trains_concurrently(self, rng):
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = make_ds(rng, n=64)
        configs = [
            small_cfg(latent_dim=16, supervisor_hidden_dim=8, lr=0.01),
            small_cfg(latent_dim=32, supervisor_hidden_dim=16, lr=0.005),
            small_cfg(latent_dim=16, hidden_dim_factor=0.5, lr=0.02),
        ]
        template_cfg = max_config(configs, [40, 20])
        model = DirectPred(template_cfg, ds, target_variables=["subtype"])
        trials = build_padded_trials(model, configs, seeds=np.arange(3))

        tr = np.tile(np.arange(48), (3, 1))
        va = np.tile(np.arange(48, 64), (3, 1))
        out = vmapped_grid_fit(
            model, ds,
            start_params=trials["params"],
            start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(3),
            train_idx=tr, val_idx=va,
            masks=trials["masks"],
            batch_size=16, max_epochs=12,
        )
        assert np.all(np.isfinite(out["best_val_loss"]))
        assert out["best_val_loss"].shape == (3,)
        # every trial learns (synthetic signal is easy)
        assert np.all(out["best_val_loss"] < 1.2)


class TestHeteroHPO:
    def test_mixed_arch_hpo_round(self, rng, tmp_path):
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.train.hpo import HyperparameterTuning
        from flexynesis_tpu.utils.synthetic import write_synthetic_folder

        p = tmp_path / "h"
        write_synthetic_folder(str(p), n_train=80, n_test=40, seed=19)
        imp = DataImporter(str(p), ["gex"], top_percentile=50, min_features=20)
        train_ds, _ = imp.import_data()
        tuner = HyperparameterTuning(
            train_ds, DirectPred, "DirectPred",
            target_variables=["subtype"], n_iter=4, batch_ask=4,
            early_stop_patience=3,
        )
        for d in tuner.space.dimensions:
            if d.name == "epochs":
                d.categories = [8]
            if d.name == "batch_size":
                d.categories = [32]
        # random initial points sample DIFFERENT latent/hidden dims -> the
        # whole round must go through the padded-vmap path
        model, best = tuner.perform_tuning()
        assert model is not None and model.params is not None
        assert np.isfinite(best["lr"])


class TestVAEHetero:
    def test_padded_vae_forward_equals_exact(self, rng):
        from flexynesis_tpu.models.supervised_vae import SupervisedVAE
        from flexynesis_tpu.parallel.hetero import supervised_vae_trial_mask

        ds = make_ds(rng)
        cfg_small = small_cfg()
        cfg_big = small_cfg(latent_dim=32, hidden_dim_factor=0.5,
                            supervisor_hidden_dim=16)
        exact = SupervisedVAE(cfg_small, ds, target_variables=["subtype"])
        exact.init_params(ds, seed=7)
        padded = SupervisedVAE(cfg_big, ds, target_variables=["subtype"])
        padded.init_params(ds, seed=7)
        mask, _ = supervised_vae_trial_mask(
            jax.tree.map(np.asarray, padded.params),
            cfg_small, exact.layers, exact.input_dims,
        )
        assert jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(
            jax.tree.map(np.asarray, padded.params)
        )

        # embed exact weights into the padded layout (block-place the
        # top-level FC over concatenated latents like the fusion block)
        def place(s, t, m):
            out = np.zeros_like(np.asarray(t))
            s = np.asarray(s)
            out[tuple(slice(0, d) for d in s.shape)] = s
            return out * np.asarray(m)

        embedded = jax.tree.map(place, exact.params, padded.params, mask)
        L_s = 16
        L_m = 32
        for key in ("FC_mean", "FC_log_var"):
            k_small = np.asarray(exact.params[key]["kernel"])
            k_t = np.asarray(padded.params[key]["kernel"])
            out = np.zeros_like(k_t)
            for m in range(2):
                out[m * L_m : m * L_m + L_s, :L_s] = k_small[
                    m * L_s : (m + 1) * L_s
                ]
            embedded[key]["kernel"] = out * np.asarray(mask[key]["kernel"])
        padded.params = embedded

        x = exact.make_eval_x(ds)
        oe = exact._forward_eval(x)
        op = padded._forward_eval(x)
        np.testing.assert_allclose(
            np.asarray(oe["outputs"]["subtype"]),
            np.asarray(op["outputs"]["subtype"]), rtol=1e-4, atol=1e-5,
        )
        for ln in ("gex", "cnv"):
            np.testing.assert_allclose(
                np.asarray(oe["x_hat"][ln]), np.asarray(op["x_hat"][ln]),
                rtol=1e-4, atol=1e-5,
            )
        # padded latent dims are exactly zero
        z = np.asarray(op["embeddings"])
        np.testing.assert_allclose(z[:, L_s:], 0.0, atol=1e-6)

    def test_masked_mmd_matches_truncated(self, rng):
        import jax.numpy as jnp

        from flexynesis_tpu.ops.losses import masked_mmd_loss, mmd_loss

        L_s, L_m, B = 8, 16, 20
        key = jax.random.key(0)
        z_small = jnp.asarray(rng.normal(size=(B, L_s)).astype(np.float32))
        z_pad = jnp.pad(z_small, ((0, 0), (0, L_m - L_s)))
        xh = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
        exact_val = mmd_loss(key, z_small, xh, x)
        mask = jnp.concatenate([jnp.ones(L_s), jnp.zeros(L_m - L_s)])
        padded_val = masked_mmd_loss(
            key, z_pad, xh, x, mask, jnp.float32(L_s)
        )
        # prior draws differ in shape ((200, L_s) vs masked (200, L_m)), so
        # values agree in distribution; with the SAME seed the masked prior's
        # first L_s dims match exactly -> the values must be very close
        np.testing.assert_allclose(
            float(exact_val), float(padded_val), rtol=0.05
        )

    def test_padded_crossmodal_forward_equals_exact(self, rng):
        """Asymmetric input/output layer subsets exercise the decoder-subset
        path of the shared VAE-family mask builder."""
        from flexynesis_tpu.models.crossmodal_pred import CrossModalPred
        from flexynesis_tpu.parallel.hetero import supervised_vae_trial_mask

        ds = make_ds(rng)
        cfg_small = small_cfg()
        cfg_big = small_cfg(latent_dim=32, hidden_dim_factor=0.5,
                            supervisor_hidden_dim=16)
        kw = dict(target_variables=["subtype"],
                  input_layers=["gex", "cnv"], output_layers=["cnv"])
        exact = CrossModalPred(cfg_small, ds, **kw)
        exact.init_params(ds, seed=7)
        padded = CrossModalPred(cfg_big, ds, **kw)
        padded.init_params(ds, seed=7)
        mask, _ = supervised_vae_trial_mask(
            jax.tree.map(np.asarray, padded.params),
            cfg_small, exact.layers, exact.input_dims,
        )
        assert jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(
            jax.tree.map(np.asarray, padded.params)
        )

        def place(s, t, m):
            out = np.zeros_like(np.asarray(t))
            s = np.asarray(s)
            out[tuple(slice(0, d) for d in s.shape)] = s
            return out * np.asarray(m)

        embedded = jax.tree.map(place, exact.params, padded.params, mask)
        L_s, L_m = 16, 32
        for key in ("FC_mean", "FC_log_var"):
            k_small = np.asarray(exact.params[key]["kernel"])
            k_t = np.asarray(padded.params[key]["kernel"])
            out = np.zeros_like(k_t)
            for m in range(2):  # 2 input layers feed the concat
                out[m * L_m : m * L_m + L_s, :L_s] = k_small[
                    m * L_s : (m + 1) * L_s
                ]
            embedded[key]["kernel"] = out * np.asarray(mask[key]["kernel"])
        padded.params = embedded

        x = exact.make_eval_x(ds)
        oe = exact._forward_eval(x)
        op = padded._forward_eval(x)
        np.testing.assert_allclose(
            np.asarray(oe["outputs"]["subtype"]),
            np.asarray(op["outputs"]["subtype"]), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(oe["x_hat"]["cnv"]), np.asarray(op["x_hat"]["cnv"]),
            rtol=1e-4, atol=1e-5,
        )

    def test_crossmodal_mixed_round_trains(self, rng):
        from flexynesis_tpu.models.crossmodal_pred import CrossModalPred
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = make_ds(rng, n=64)
        configs = [
            small_cfg(latent_dim=16, lr=0.01),
            small_cfg(latent_dim=32, supervisor_hidden_dim=16, lr=0.005),
        ]
        template_cfg = max_config(configs, [40, 20])
        model = CrossModalPred(
            template_cfg, ds, target_variables=["subtype"],
            input_layers=["gex"], output_layers=["cnv"],
        )
        trials = build_padded_trials(model, configs, seeds=np.arange(2))
        assert "aux" in trials
        out = vmapped_grid_fit(
            model, ds,
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(2),
            train_idx=np.tile(np.arange(48), (2, 1)),
            val_idx=np.tile(np.arange(48, 64), (2, 1)),
            masks=trials["masks"], aux=trials["aux"],
            batch_size=16, max_epochs=8,
        )
        assert np.all(np.isfinite(out["best_val_loss"]))

    def test_vae_mixed_round_mesh_sharded_matches_unsharded(self, rng):
        """Round-3 verdict item 3 (VAE variant): the padded VAE group's
        per-trial aux pytree (latent masks for the exact small-architecture
        MMD) must shard over the trial mesh alongside params, and the
        sharded round must reproduce the unsharded losses."""
        from flexynesis_tpu.models.supervised_vae import SupervisedVAE
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.mesh import get_mesh
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = make_ds(rng, n=64)
        configs = [
            small_cfg(latent_dim=16, lr=0.01),
            small_cfg(latent_dim=32, supervisor_hidden_dim=16, lr=0.005),
        ] * 4
        template_cfg = max_config(configs, [40, 20])
        model = SupervisedVAE(template_cfg, ds, target_variables=["subtype"])
        trials = build_padded_trials(model, configs, seeds=np.arange(8))
        common = dict(
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(8),
            train_idx=np.tile(np.arange(48), (8, 1)),
            val_idx=np.tile(np.arange(48, 64), (8, 1)),
            masks=trials["masks"], aux=trials["aux"],
        )
        mesh = get_mesh((("trial", 8),))
        # strict one-step arm + loose multi-epoch arm: see the GNN variant
        # for why multi-iteration scans only agree statistically
        strict = dict(common, batch_size=48, max_epochs=1,
                      param_dtype="float32")
        out_plain = vmapped_grid_fit(model, ds, **strict)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **strict)
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], atol=1e-4
        )
        loose = dict(common, batch_size=16, max_epochs=4)
        out_plain = vmapped_grid_fit(model, ds, **loose)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **loose)
        assert np.all(np.isfinite(out_mesh["best_val_loss"]))
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], rtol=5e-2
        )

    def test_vae_mixed_round_trains(self, rng):
        from flexynesis_tpu.models.supervised_vae import SupervisedVAE
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = make_ds(rng, n=64)
        configs = [
            small_cfg(latent_dim=16, lr=0.01),
            small_cfg(latent_dim=32, supervisor_hidden_dim=16, lr=0.005),
        ]
        template_cfg = max_config(configs, [40, 20])
        model = SupervisedVAE(template_cfg, ds, target_variables=["subtype"])
        trials = build_padded_trials(model, configs, seeds=np.arange(2))
        assert "aux" in trials
        out = vmapped_grid_fit(
            model, ds,
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(2),
            train_idx=np.tile(np.arange(48), (2, 1)),
            val_idx=np.tile(np.arange(48, 64), (2, 1)),
            masks=trials["masks"], aux=trials["aux"],
            batch_size=16, max_epochs=10,
        )
        assert np.all(np.isfinite(out["best_val_loss"]))


class TestGNNHetero:
    def _nw_ds(self, rng, n=48, gex=20, k=3):
        import pandas as pd

        from flexynesis_tpu.data.dataset import MultiOmicDatasetNW

        base = make_ds(rng, n=n, gex=gex, cnv=10, k=k)
        genes = [f"g{i}" for i in range(gex)]
        edges = pd.DataFrame({
            "protein1": [genes[i] for i in range(gex)],
            "protein2": [genes[(i + 1) % gex] for i in range(gex)],
        })
        return MultiOmicDatasetNW(base, edges)

    def _gnn_cfg(self, **kw):
        cfg = {
            "latent_dim": 16, "node_embedding_dim": 4, "num_convs": 2,
            "lr": 0.01, "supervisor_hidden_dim": 8, "epochs": 8,
            "batch_size": 16, "activation": "relu",
        }
        cfg.update(kw)
        return cfg

    def _embed_gnn(self, exact, padded, mask, E_s, E_m):
        """Place small-GNN params into the padded layout (fc needs per-node
        block placement: node m's channels live at [m*E_max, m*E_max+E_s))."""

        def place(s, t, m):
            out = np.zeros_like(np.asarray(t))
            s = np.asarray(s)
            out[tuple(slice(0, d) for d in s.shape)] = s
            return out * np.asarray(m)

        embedded = jax.tree.map(place, exact.params, padded.params, mask)
        k_small = np.asarray(exact.params["encoder"]["fc"]["kernel"])
        k_t = np.asarray(padded.params["encoder"]["fc"]["kernel"])
        n_nodes = k_t.shape[0] // E_m
        out = np.zeros_like(k_t)
        for m in range(n_nodes):
            out[m * E_m : m * E_m + E_s, : k_small.shape[1]] = k_small[
                m * E_s : (m + 1) * E_s
            ]
        embedded["encoder"]["fc"]["kernel"] = out * np.asarray(
            mask["encoder"]["fc"]["kernel"]
        )
        return embedded

    @pytest.mark.parametrize("conv_type", ["GC", "GCN"])
    def test_padded_gnn_forward_equals_exact(self, rng, conv_type):
        from flexynesis_tpu.models.gnn import GNN
        from flexynesis_tpu.parallel.hetero import gnn_trial_mask

        ds = self._nw_ds(rng)
        cfg_small = self._gnn_cfg()
        cfg_big = self._gnn_cfg(latent_dim=32, node_embedding_dim=8,
                                supervisor_hidden_dim=16)
        exact = GNN(cfg_small, ds, target_variables=["subtype"],
                    gnn_conv_type=conv_type)
        exact.init_params(ds, seed=7)
        padded = GNN(cfg_big, ds, target_variables=["subtype"],
                     gnn_conv_type=conv_type)
        padded.init_params(ds, seed=7)
        mask, _ = gnn_trial_mask(
            jax.tree.map(np.asarray, padded.params),
            cfg_small, padded.layers, padded.input_dims,
        )
        assert jax.tree_util.tree_structure(mask) == jax.tree_util.tree_structure(
            jax.tree.map(np.asarray, padded.params)
        )
        padded.params = self._embed_gnn(exact, padded, mask, E_s=4, E_m=8)

        x = exact.make_eval_x(ds)
        oe = exact._forward_eval(x)["outputs"]["subtype"]
        op = padded._forward_eval(x)["outputs"]["subtype"]
        np.testing.assert_allclose(
            np.asarray(oe), np.asarray(op), rtol=1e-4, atol=1e-5
        )

    def test_gnn_mixed_round_trains(self, rng):
        from flexynesis_tpu.models.gnn import GNN
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = self._nw_ds(rng, n=64)
        configs = [
            self._gnn_cfg(node_embedding_dim=4, lr=0.01),
            self._gnn_cfg(node_embedding_dim=8, latent_dim=32, lr=0.005),
        ]
        template_cfg = max_config(configs, [ds.dat["all"].shape[1]])
        model = GNN(template_cfg, ds, target_variables=["subtype"],
                    gnn_conv_type="GC")
        trials = build_padded_trials(model, configs, seeds=np.arange(2))
        out = vmapped_grid_fit(
            model, ds,
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(2),
            train_idx=np.tile(np.arange(48), (2, 1)),
            val_idx=np.tile(np.arange(48, 64), (2, 1)),
            masks=trials["masks"],
            batch_size=16, max_epochs=8,
        )
        assert np.all(np.isfinite(out["best_val_loss"]))

    def test_gnn_mixed_round_mesh_sharded_matches_unsharded(self, rng):
        """Round-3 verdict item 3: a padded NON-DirectPred hetero group
        sharded over the 8-device trial mesh must reproduce the unsharded
        result. The GNN case also proves the adjacency-as-batch-argument
        contract (models/gnn.py make_batch '_adj' broadcast entry) composes
        with NamedSharding: per-trial params/opt/masks shard across the
        trial axis while the dense operator broadcasts whole."""
        from flexynesis_tpu.models.gnn import GNN
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.mesh import get_mesh
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = self._nw_ds(rng, n=64)
        configs = [
            self._gnn_cfg(node_embedding_dim=4, lr=0.01),
            self._gnn_cfg(node_embedding_dim=8, latent_dim=32, lr=0.005),
        ] * 4  # 8 trials -> one per device on the trial mesh
        template_cfg = max_config(configs, [ds.dat["all"].shape[1]])
        model = GNN(template_cfg, ds, target_variables=["subtype"],
                    gnn_conv_type="GC")
        trials = build_padded_trials(model, configs, seeds=np.arange(8))
        common = dict(
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(8),
            train_idx=np.tile(np.arange(48), (8, 1)),
            val_idx=np.tile(np.arange(48, 64), (8, 1)),
            masks=trials["masks"],
        )
        mesh = get_mesh((("trial", 8),))
        # strict arm: one full-batch step — sharded and unsharded programs
        # agree to float-rounding level when no scan iteration feeds the
        # next (measured maxabs 0.0 at f32 here; ~5e-5 at other shapes —
        # GSPMD compiles different instruction orderings, never bitwise-
        # guaranteed). Multi-iteration scans amplify that per-step rounding
        # through lr=0.01 + BatchNorm to ~1e-3/step at these tiny shapes
        # (same effect the fused-CV parity test bounds at rtol=2e-3) —
        # hence the separate loose multi-epoch arm below.
        strict = dict(common, batch_size=48, max_epochs=1,
                      param_dtype="float32")
        out_plain = vmapped_grid_fit(model, ds, **strict)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **strict)
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], atol=1e-4
        )
        # loose arm: real multi-epoch training stays statistically equivalent
        loose = dict(common, batch_size=16, max_epochs=4)
        out_plain = vmapped_grid_fit(model, ds, **loose)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **loose)
        assert np.all(np.isfinite(out_mesh["best_val_loss"]))
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], rtol=5e-2
        )

    def test_gnn_sparse_mixed_round_mesh_sharded_matches_unsharded(self, rng):
        """Round-4 verdict item 4: the SPARSE edge-dict operator must
        compose with hetero padding AND mesh sharding. The sparse adjacency
        is a {src,dst,w,...} pytree riding the batch as a '_adj' broadcast
        entry (trials.py '_'-prefix contract): it must broadcast WHOLE
        under NamedSharding while per-trial params/opt/masks shard over the
        trial axis. Also pins operator parity end-to-end: the sparse
        mesh-sharded engine reproduces the DENSE unsharded engine's losses
        on the same graph (GNNNet params are operator-independent, so the
        strict one-step arm compares the same function)."""
        from flexynesis_tpu.models.gnn import GNN
        from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
        from flexynesis_tpu.parallel.mesh import get_mesh
        from flexynesis_tpu.parallel.trials import vmapped_grid_fit

        ds = self._nw_ds(rng, n=64)
        configs = [
            self._gnn_cfg(node_embedding_dim=4, lr=0.01),
            self._gnn_cfg(node_embedding_dim=8, latent_dim=32, lr=0.005),
        ] * 4  # 8 trials -> one per device on the trial mesh
        template_cfg = max_config(configs, [ds.dat["all"].shape[1]])
        template_cfg["gnn_sparse"] = True
        model = GNN(template_cfg, ds, target_variables=["subtype"],
                    gnn_conv_type="GC")
        assert isinstance(model._adj, dict)  # sparse operator selected
        trials = build_padded_trials(model, configs, seeds=np.arange(8))
        common = dict(
            start_params=trials["params"], start_stats=trials["batch_stats"],
            lrs=np.asarray([c["lr"] for c in configs], np.float32),
            seeds=np.arange(8),
            train_idx=np.tile(np.arange(48), (8, 1)),
            val_idx=np.tile(np.arange(48, 64), (8, 1)),
            masks=trials["masks"],
        )
        mesh = get_mesh((("trial", 8),))
        # strict arm (one full-batch step, f32): sparse meshed == sparse
        # unsharded == dense unsharded to float-rounding level
        strict = dict(common, batch_size=48, max_epochs=1,
                      param_dtype="float32")
        out_plain = vmapped_grid_fit(model, ds, **strict)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **strict)
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], atol=1e-4
        )
        dense_cfg = dict(template_cfg, gnn_sparse=False)
        dense = GNN(dense_cfg, ds, target_variables=["subtype"],
                    gnn_conv_type="GC")
        assert not isinstance(dense._adj, dict)
        out_dense = vmapped_grid_fit(dense, ds, **strict)
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_dense["best_val_loss"], atol=1e-4
        )
        # loose arm: real multi-epoch sparse training stays statistically
        # equivalent sharded vs unsharded
        loose = dict(common, batch_size=16, max_epochs=4)
        out_plain = vmapped_grid_fit(model, ds, **loose)
        out_mesh = vmapped_grid_fit(model, ds, mesh=mesh, **loose)
        assert np.all(np.isfinite(out_mesh["best_val_loss"]))
        np.testing.assert_allclose(
            out_mesh["best_val_loss"], out_plain["best_val_loss"], rtol=5e-2
        )

    def test_bucket_key_splits_on_num_convs(self):
        from flexynesis_tpu.parallel.hetero import bucket_key

        a = self._gnn_cfg(num_convs=1)
        b = self._gnn_cfg(num_convs=2)
        c = self._gnn_cfg(num_convs=2, node_embedding_dim=16)
        assert bucket_key("GNN", a) != bucket_key("GNN", b)
        assert bucket_key("GNN", b) == bucket_key("GNN", c)
        # non-GNN families pad every architecture dim
        assert bucket_key("DirectPred", {"epochs": 10, "batch_size": 32}) == (
            10, 32,
        )
