"""Model serialization + inference-mode reconstruction.

Capability parity with /root/reference/flexynesis/inference.py and the save
path in __main__.py:1558-1771:

* ``save_model`` — parameters as safetensors (flattened pytree keys) — the
  native format here; there is no torch pickle because models are Flax
  pytrees. ``.msgpack`` (flax serialization) is also supported.
* ``save_model_config`` — final_model_config.json with the same keys the
  reference records (model_class, input_dims, layers, target variables,
  sampled hyperparams, ...), plus ``output_dims`` so categorical head widths
  reconstruct exactly.
* ``write_artifacts`` — preprocessing state: schema_version 1, feature
  lists, fitted StandardScalers / OrdinalEncoders (joblib, or fully
  JSON-ified sklearn state matching the reference's schema so artifacts are
  cross-readable).
* ``check_model_type`` — magic-byte sniffing (safetensors header vs ZIP/pickle).
* ``reconstruct_model`` — rebuild a model instance from safetensors +
  config JSON + artifacts without the original dataset.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace
from typing import Dict

import numpy as np

MODEL_CLASS_NAMES = [
    "DirectPred",
    "supervised_vae",
    "SupervisedVAE",
    "MultiTripletNetwork",
    "CrossModalPred",
    "GNN",
]


def get_model_registry():
    from .models import MODEL_REGISTRY

    registry = dict(MODEL_REGISTRY)
    registry["SupervisedVAE"] = registry["supervised_vae"]
    return registry


# ---------------------------------------------------------------- save side


def _flatten_pytree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, f"{prefix}{k}/"))
    else:
        # ascontiguousarray is REQUIRED: some JAX backends (e.g. the axon
        # TPU plugin) export device arrays as non-C-contiguous numpy views,
        # and safetensors serializes the raw buffer without normalizing
        # strides — silently corrupting every non-square matrix
        out[prefix[:-1]] = np.ascontiguousarray(np.asarray(tree))
    return out


def _unflatten_pytree(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_model(model, path: str) -> str:
    """Save params + batch_stats as safetensors with namespaced keys.

    GNN models additionally embed their interaction graph (edge_index) so
    inference can rebuild the node tensor without re-downloading the network.
    """
    from safetensors.numpy import save_file

    flat = {}
    flat.update(
        {f"params/{k}": v for k, v in _flatten_pytree(model.params).items()}
    )
    flat.update(
        {
            f"batch_stats/{k}": v
            for k, v in _flatten_pytree(model.batch_stats).items()
        }
    )
    if hasattr(model, "nw_dataset"):
        flat["graph/edge_index"] = np.ascontiguousarray(
            np.asarray(model.nw_dataset.edge_index, dtype=np.int32)
        )
    save_file(flat, path)
    return path


def load_weights(path: str, flat: dict = None):
    """``flat`` short-circuits the file read when the caller already
    deserialized the safetensors dict (GNN reconstruction reads it for the
    embedded graph first)."""
    if flat is None:
        from safetensors.numpy import load_file

        flat = load_file(path)
    params = _unflatten_pytree(
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")}
    )
    batch_stats = _unflatten_pytree(
        {
            k[len("batch_stats/"):]: v
            for k, v in flat.items()
            if k.startswith("batch_stats/")
        }
    )
    return params, batch_stats


def save_model_config(model, path: str) -> str:
    config = {
        "model_class": model.model_name,
        "model_module": model.__class__.__module__,
    }
    for attr in (
        "input_dims",
        "layers",
        "input_layers",
        "output_layers",
        "device_type",
        "target_variables",
        "surv_event_var",
        "surv_time_var",
        "config",
        "output_dims",
        "use_loss_weighting",
        "gnn_conv_type",
        "batch_variables",
    ):
        if hasattr(model, attr):
            config[attr] = getattr(model, attr)
    if hasattr(model, "nw_dataset"):
        config["node_names"] = list(model.nw_dataset.node_names)
        config["n_node_feats"] = int(model.nw_dataset.node_features.shape[2])
    config["num_layers"] = len(model.layers)
    config["variable_types"] = {
        v: model.variable_types[v] for v in model.variables
    }
    config.update(model.config)
    with open(path, "w") as fh:
        json.dump(config, fh, indent=2, default=str)
    return path


def build_artifacts(
    data_importer,
    data_types,
    target_variables,
    covariates=None,
    join_key: str = "JoinKey",
    string_organism: int = 9606,
    string_node_name: str = "gene_name",
) -> dict:
    """Preprocessing-state artifact dict (schema_version 1)."""
    return {
        "schema_version": 1,
        "data_types": list(getattr(data_importer, "train_features", {}).keys())
        or list(data_types),
        "original_modalities": list(data_types),
        "target_variables": list(target_variables or []),
        "feature_lists": {
            k: list(v)
            for k, v in getattr(data_importer, "train_features", {}).items()
        },
        "transforms": getattr(data_importer, "scalers", {}) or {},
        "label_encoders": getattr(data_importer, "label_encoders", {}) or {},
        "covariate_vars": list(covariates or []),
        "covariate_columns": {
            k: list(v)
            for k, v in (
                getattr(data_importer, "covariate_columns", {}) or {}
            ).items()
        },
        "join_key": join_key,
        "string_organism": string_organism,
        "string_node_name": string_node_name,
    }


def write_artifacts(artifacts: dict, path: str, as_json: bool = False) -> str:
    if not as_json:
        import joblib

        joblib.dump(artifacts, path)
        return path
    json_ready = {
        k: artifacts[k]
        for k in (
            "schema_version",
            "data_types",
            "original_modalities",
            "target_variables",
            "covariate_vars",
            "join_key",
            "string_organism",
            "string_node_name",
        )
    }
    # optional key (absent in pre-session-5 and reference-format artifacts)
    if "covariate_columns" in artifacts:
        json_ready["covariate_columns"] = {
            k: list(v) for k, v in artifacts["covariate_columns"].items()
        }
    json_ready["feature_lists"] = {
        m: list(f) for m, f in artifacts["feature_lists"].items()
    }
    json_ready["transforms"] = {
        m: _scaler_to_json(s) for m, s in artifacts["transforms"].items()
    }
    json_ready["label_encoders"] = {
        v: _encoder_to_json(e) for v, e in artifacts["label_encoders"].items()
    }
    with open(path, "w") as fh:
        json.dump(json_ready, fh, indent=2)
    return path


def _scaler_to_json(scaler):
    if scaler is None:
        return None
    d = {
        "type": "StandardScaler",
        "with_mean": scaler.with_mean,
        "with_std": scaler.with_std,
    }
    for attr, key in (
        ("mean_", "mean"),
        ("scale_", "scale"),
        ("var_", "var"),
    ):
        if hasattr(scaler, attr):
            d[key] = np.asarray(getattr(scaler, attr)).tolist()
    if hasattr(scaler, "n_features_in_"):
        d["n_features_in"] = int(scaler.n_features_in_)
    if hasattr(scaler, "feature_names_in_"):
        d["feature_names_in"] = list(scaler.feature_names_in_)
    if hasattr(scaler, "n_samples_seen_"):
        n = scaler.n_samples_seen_
        d["n_samples_seen"] = n.tolist() if isinstance(n, np.ndarray) else int(n)
    return d


def _encoder_to_json(encoder):
    if encoder is None:
        return None
    d = {
        "type": "OrdinalEncoder",
        "categories": [list(map(_json_safe, c)) for c in encoder.categories_],
        "handle_unknown": encoder.handle_unknown,
        "unknown_value": encoder.unknown_value,
    }
    if hasattr(encoder, "encoded_missing_value"):
        val = encoder.encoded_missing_value
        d["encoded_missing_value"] = (
            "__NaN__" if isinstance(val, float) and np.isnan(val) else val
        )
    return d


def _json_safe(v):
    if isinstance(v, float) and np.isnan(v):
        return "__NaN__"
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


# ---------------------------------------------------------------- load side


def check_model_type(path: str) -> str:
    """Sniff magic bytes: 'safetensors' vs 'pickle' (reference inference.py:26-57)."""
    with open(path, "rb") as fh:
        head = fh.read(10)
    if len(head) >= 9:
        try:
            header_len = int.from_bytes(head[:8], "little")
            if 0 < header_len < 100_000_000 and head[8:9] == b"{":
                return "safetensors"
        except Exception:
            pass
    if head[:2] == b"PK" or head[:1] == b"\x80":
        return "pickle"
    raise ValueError(f"Unrecognized model file format: {path}")


def load_and_sniff_artifacts(path: str) -> dict:
    """Load artifacts from joblib or JSON, rehydrating sklearn objects."""
    with open(path, "rb") as fh:
        head = fh.read(64).lstrip()
    if head.startswith(b"{"):
        with open(path) as fh:
            raw = json.load(fh)
        return _deserialize_json_artifacts(raw)
    import joblib

    return joblib.load(path)


def _deserialize_json_artifacts(raw: dict) -> dict:
    from sklearn.preprocessing import OrdinalEncoder, StandardScaler

    out = dict(raw)
    transforms = {}
    for m, d in raw.get("transforms", {}).items():
        if d is None:
            transforms[m] = None
            continue
        s = StandardScaler(
            with_mean=d.get("with_mean", True), with_std=d.get("with_std", True)
        )
        if "mean" in d:
            s.mean_ = np.asarray(d["mean"])
        if "scale" in d:
            s.scale_ = np.asarray(d["scale"])
        if "var" in d:
            s.var_ = np.asarray(d["var"])
        if "n_features_in" in d:
            s.n_features_in_ = d["n_features_in"]
        if "feature_names_in" in d:
            s.feature_names_in_ = np.asarray(d["feature_names_in"], dtype=object)
        if "n_samples_seen" in d:
            n = d["n_samples_seen"]
            s.n_samples_seen_ = np.asarray(n) if isinstance(n, list) else n
        transforms[m] = s
    out["transforms"] = transforms

    encoders = {}
    for v, d in raw.get("label_encoders", {}).items():
        if d is None:
            encoders[v] = None
            continue
        if d.get("type") == "LabelEncoder":
            # reference artifacts may carry LabelEncoders
            # (reference __main__.py:1719-1723); normalize to the
            # OrdinalEncoder form the pipeline uses — same class order,
            # unknowns -> -1 (the framework-wide missing-label convention)
            d = {
                "type": "OrdinalEncoder",
                "categories": [list(d["classes"])],
                "handle_unknown": "use_encoded_value",
                "unknown_value": -1,
            }
        unk = d.get("unknown_value", -1)
        enc = OrdinalEncoder(
            handle_unknown=d.get("handle_unknown", "use_encoded_value"),
            unknown_value=unk,
        )
        cats = [
            np.asarray(
                [np.nan if c == "__NaN__" else c for c in cat], dtype=object
            )
            for cat in d["categories"]
        ]
        enc.categories_ = cats
        enc.n_features_in_ = 1
        miss = d.get("encoded_missing_value", np.nan)
        enc.encoded_missing_value = np.nan if miss == "__NaN__" else miss
        enc._missing_indices = {
            i: int(np.where([isinstance(c, float) and np.isnan(c) for c in cat])[0][0])
            for i, cat in enumerate(cats)
            if any(isinstance(c, float) and np.isnan(c) for c in cat)
        }
        enc._infrequent_enabled = False
        encoders[v] = enc
    out["label_encoders"] = encoders
    return out


def build_dataset_namespace(config: dict, artifacts: dict) -> SimpleNamespace:
    """Fake dataset carrying just what model __init__ needs
    (reference inference.py:73-122)."""
    feature_lists = artifacts.get("feature_lists", {})
    variable_types = config.get("variable_types", {})
    output_dims = config.get("output_dims", {})
    ann = {}
    label_mappings = {}
    for var, n_out in output_dims.items():
        if variable_types.get(var) == "categorical":
            ann[var] = np.arange(n_out, dtype=np.float32)
        else:
            ann[var] = np.zeros(max(n_out, 1), dtype=np.float32)
    for var, enc in (artifacts.get("label_encoders") or {}).items():
        if enc is not None and hasattr(enc, "categories_"):
            label_mappings[var] = {
                int(i): c for i, c in enumerate(enc.categories_[0])
            }
    dat = {
        k: np.zeros((1, len(v)), dtype=np.float32) for k, v in feature_lists.items()
    }
    return SimpleNamespace(
        dat=dat,
        ann=ann,
        variable_types=variable_types,
        features={k: list(v) for k, v in feature_lists.items()},
        samples=["_dummy_"],
        label_mappings=label_mappings,
    )


def reconstruct_model(weights_path: str, config_path: str, artifacts) -> object:
    """Rebuild a trained model from safetensors + config + artifacts."""
    with open(config_path) as fh:
        config = json.load(fh)
    if isinstance(artifacts, str):
        artifacts = load_and_sniff_artifacts(artifacts)

    registry = get_model_registry()
    cls_name = config["model_class"]
    if cls_name not in registry:
        raise ValueError(f"Unknown model class: {cls_name}")
    model_cls = registry[cls_name]

    ds = build_dataset_namespace(config, artifacts)
    hyper = {
        k: config[k]
        for k in (
            "latent_dim",
            "hidden_dim_factor",
            "lr",
            "supervisor_hidden_dim",
            "epochs",
            "batch_size",
            "node_embedding_dim",
            "num_convs",
            "activation",
            # architecture-bearing extras: a GNN trained with a pooled
            # readout (or a model with the fused Pallas blocks) must
            # rebuild the same module or the loaded params won't match
            "gnn_readout",
            # gnn_sparse does NOT change params (dense/sparse operators
            # are parity-tested equal) — persisted only so an explicit
            # perf choice survives reload
            "gnn_sparse",
            "fused_kernels",
        )
        if k in config
    }
    kwargs = dict(
        config=hyper,
        dataset=ds,
        target_variables=[
            v
            for v in config.get("target_variables", [])
            if v != config.get("surv_event_var")
        ],
        surv_event_var=config.get("surv_event_var"),
        surv_time_var=config.get("surv_time_var"),
        use_loss_weighting=config.get("use_loss_weighting", True),
        device_type=config.get("device_type"),
        batch_variables=config.get("batch_variables"),
    )
    if cls_name == "CrossModalPred":
        kwargs["input_layers"] = config.get("input_layers")
        kwargs["output_layers"] = config.get("output_layers")
    flat = None
    if cls_name == "GNN":
        from safetensors.numpy import load_file

        flat = load_file(weights_path)
        if "graph/edge_index" not in flat:
            raise ValueError(
                "GNN weights are missing the embedded interaction graph."
            )
        node_names = config["node_names"]
        n_mods = int(config.get("n_node_feats", 1))
        ds.node_names = node_names
        ds.node_features = np.zeros((1, len(node_names), n_mods), np.float32)
        ds.edge_index = np.asarray(flat["graph/edge_index"], np.int32)
        ds.dat = {"all": np.zeros((1, len(node_names) * n_mods), np.float32)}
        ds.features = {
            "all": [f"{g}:{m}" for g in node_names for m in range(n_mods)]
        }
        kwargs["gnn_conv_type"] = config.get("gnn_conv_type", "GC")
    model = model_cls(**kwargs)
    params, batch_stats = load_weights(weights_path, flat=flat)
    model.params = params
    model.batch_stats = batch_stats
    return model
