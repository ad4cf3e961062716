"""Tutorial: GNNs with custom gene-interaction networks.

Mirrors the reference's gnn_custom_networks notebook without any
downloads: generate a synthetic expression cohort, derive a
co-expression network from the training matrix (the offline substitute
for STRING), and train a GNN over it.

    python examples/gnn_custom_networks_tutorial.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flexynesis_tpu as fx  # noqa: E402
from flexynesis_tpu.utils.synthetic import write_synthetic_folder  # noqa: E402


def main():
    # FX_TUTORIAL_FAST=1 shrinks the run for CI smoke tests
    fast = bool(os.environ.get("FX_TUTORIAL_FAST"))
    n_train, n_test, epochs = (60, 30, 5) if fast else (200, 100, 30)
    workdir = tempfile.mkdtemp(prefix="fx_gnn_tutorial_")
    data_dir = os.path.join(workdir, "data")
    print(f"[1/6] Generating a synthetic expression cohort under {data_dir}")
    write_synthetic_folder(
        data_dir, n_train=n_train, n_test=n_test,
        n_features={"gex": 60 if fast else 120}, seed=3,
    )

    print("[2/6] Building a co-expression network from the training matrix")
    from flexynesis_tpu.coexpression import generate_coexpression_network

    net_path = os.path.join(workdir, "coexpression_net.csv")
    net = generate_coexpression_network(
        os.path.join(data_dir, "train", "gex.csv"),
        net_path,
        method="pearson",
        correlation_threshold=0.3,
        top_k=5,
    )
    print(net.head().to_string(index=False))

    print("[3/6] Import + wrap as a node-feature graph dataset")
    importer = fx.DataImporter(
        data_dir, ["gex"], top_percentile=80, min_features=50
    )
    train_ds, test_ds = importer.import_data()

    from flexynesis_tpu.data.dataset import MultiOmicDatasetNW
    from flexynesis_tpu.data.graph import read_user_graph

    graph_df = read_user_graph(net_path)
    train_nw = MultiOmicDatasetNW(train_ds, graph_df)
    train_nw.print_stats()
    # the test split reuses the training node set + interaction graph
    test_nw = MultiOmicDatasetNW(
        test_ds, train_nw.interaction_df, node_names=train_nw.node_names
    )

    print("[4/6] Train a GNN (graph-convolution type GC)")
    tuner = fx.HyperparameterTuning(
        train_nw,
        fx.GNN,
        "GNN",
        target_variables=["subtype"],
        n_iter=1 if fast else 3,
        early_stop_patience=5,
        gnn_conv_type="GC",
    )
    for d in tuner.space.dimensions:  # keep the tutorial fast
        if d.name == "epochs":
            d.categories = [epochs]
    model, best = tuner.perform_tuning()
    print("    best hyperparameters:", best)

    print("[5/6] Evaluation")
    preds = model.predict(test_nw)
    stats = fx.evaluate_wrapper("GNN", preds, test_nw)
    print(stats.to_string(index=False))

    print("[6/6] Marker discovery: per-node attributions split per layer")
    imp = model.compute_feature_importance(
        test_nw, "subtype", steps_or_samples=25
    )
    top = (
        imp.sort_values("importance", ascending=False)
        .groupby("target_class")
        .head(3)[["target_class_label", "layer", "name", "importance"]]
    )
    print(top.to_string(index=False))
    print(f"\nDone. Artifacts in {workdir}")


if __name__ == "__main__":
    main()
