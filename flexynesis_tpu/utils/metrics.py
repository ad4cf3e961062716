"""Evaluation metrics: classification, regression, survival.

Capability parity with /root/reference/flexynesis/utils.py:
``evaluate_classifier`` (:467-533), ``evaluate_regressor`` (:651-679),
``evaluate_survival`` (:416-445), ``evaluate_wrapper`` (:682-739),
``get_predicted_labels`` (:742-834), bootstrap CI helpers (:448-464).

lifelines is not a dependency here: Harrell's concordance index is
implemented natively (vectorized O(n^2) pair matrix — fine for clinical
cohort sizes, and jit-friendly if moved on device).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
from scipy.stats import linregress
from sklearn.metrics import (
    average_precision_score,
    balanced_accuracy_score,
    classification_report,
    cohen_kappa_score,
    f1_score,
    mean_squared_error,
    roc_auc_score,
)


def concordance_index(
    event_times: np.ndarray,
    predicted_scores: np.ndarray,
    event_observed: Optional[np.ndarray] = None,
) -> float:
    """Harrell's C-index. Higher predicted score == longer expected survival
    (lifelines convention; callers pass -risk).

    Pair rules: (i, j) is comparable when t_i < t_j and the i-th subject had
    an event, or t_i == t_j with exactly one event (the event subject is the
    'short' one). Concordant = shorter-lived subject has the lower score;
    prediction ties count 0.5. Tied times with two events are excluded.
    """
    t = np.asarray(event_times, dtype=np.float64).ravel()
    s = np.asarray(predicted_scores, dtype=np.float64).ravel()
    e = (
        np.ones_like(t)
        if event_observed is None
        else np.asarray(event_observed, dtype=np.float64).ravel()
    )
    if np.isnan(t).any() or np.isnan(s).any() or np.isnan(e).any():
        # lifelines raises on NaN inputs; silently counting NaN-score pairs
        # as discordant would deflate the c-index and mask a broken model
        raise ValueError(
            "NaNs detected in inputs of concordance_index; correct or drop."
        )
    # i is the index of the (potentially) shorter-lived subject
    ti, tj = t[:, None], t[None, :]
    si, sj = s[:, None], s[None, :]
    ei, ej = e[:, None], e[None, :]

    comparable = ((ti < tj) & (ei == 1)) | ((ti == tj) & (ei == 1) & (ej == 0))
    concordant = comparable & (si < sj)
    tied = comparable & (si == sj)

    n_pairs = comparable.sum()
    if n_pairs == 0:
        raise ZeroDivisionError("No admissible pairs for the concordance index.")
    return float((concordant.sum() + 0.5 * tied.sum()) / n_pairs)


def evaluate_survival(outputs, durations, events) -> Dict[str, float]:
    """C-index of risk scores (higher risk -> shorter survival).

    Deliberate robustness deviation from the reference (utils.py:416-445,
    which crashes in lifelines here): a cohort with no valid
    (duration, event) rows — or no admissible pair — reports cindex=NaN
    with a warning instead of aborting a finished training run at the
    stats-writing step.
    """
    outputs = np.asarray(outputs, dtype=np.float64).ravel()
    durations = np.asarray(durations, dtype=np.float64).ravel()
    events = np.asarray(events, dtype=np.float64).ravel()
    valid = ~np.isnan(durations) & ~np.isnan(events)
    if valid.sum() == 0:
        import warnings

        warnings.warn(
            "evaluate_survival: no samples with observed duration+event; "
            "reporting cindex=NaN."
        )
        return {"cindex": float("nan")}
    outputs, durations, events = outputs[valid], durations[valid], events[valid]
    try:
        return {"cindex": concordance_index(durations, -outputs, events)}
    except ZeroDivisionError:
        import warnings

        warnings.warn(
            "evaluate_survival: no admissible pair (all times tied/censored);"
            " reporting cindex=NaN."
        )
        return {"cindex": float("nan")}


def evaluate_classifier(y_true, y_probs, print_report: bool = False) -> Dict:
    """balanced_acc, weighted F1, Cohen's kappa, AUROC (ovr weighted), AUPR."""
    y_true = np.asarray(y_true)
    y_probs = np.asarray(y_probs)
    y_pred = np.argmax(y_probs, axis=1)

    balanced_acc = balanced_accuracy_score(y_true, y_pred)
    f1 = f1_score(y_true, y_pred, average="weighted", zero_division=0)
    kappa = cohen_kappa_score(y_true, y_pred)
    try:
        if y_probs.shape[1] == 2:
            average_auroc = roc_auc_score(y_true, y_probs[:, 1])
            average_aupr = average_precision_score(y_true, y_probs[:, 1])
        else:
            average_auroc = roc_auc_score(
                y_true, y_probs, multi_class="ovr", average="weighted"
            )
            average_aupr = average_precision_score(y_true, y_probs, average="weighted")
    except ValueError:
        average_auroc = None
        average_aupr = None

    if print_report:
        print(classification_report(y_true, y_pred, zero_division=0))

    return {
        "balanced_acc": balanced_acc,
        "f1_score": f1,
        "kappa": kappa,
        "average_auroc": average_auroc,
        "average_aupr": average_aupr,
    }


def evaluate_regressor(y_true, y_pred) -> Dict[str, float]:
    """MSE, R^2 (squared Pearson r of y_true vs y_pred) and Pearson r."""
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_pred = np.asarray(y_pred, dtype=np.float64).ravel()
    mse = mean_squared_error(y_true, y_pred)
    lr = linregress(y_true, y_pred)
    return {"mse": mse, "r2": lr.rvalue**2, "pearson_corr": lr.rvalue}


def generate_bootstrap_indices(n: int, n_bootstraps: int = 1000, seed: int = 42):
    rng = np.random.default_rng(seed)
    return [rng.choice(n, size=n, replace=True) for _ in range(n_bootstraps)]


def bootstrap_metric(y_true, y_pred, indices_list, metric_fn, ci=95, **kwargs):
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    scores = [metric_fn(y_true[idx], y_pred[idx], **kwargs) for idx in indices_list]
    lower = np.percentile(scores, (100 - ci) / 2)
    upper = np.percentile(scores, 100 - (100 - ci) / 2)
    return scores, (float(np.mean(scores)), float(lower), float(upper))


def evaluate_wrapper(
    method: str,
    y_pred_dict: Dict[str, np.ndarray],
    dataset,
    surv_event_var: Optional[str] = None,
    surv_time_var: Optional[str] = None,
) -> pd.DataFrame:
    """Long-format metrics table across all predicted variables.

    Variables without annotations (unlabeled inference cohort) are skipped
    — there is no ground truth to score against."""
    rows = []
    for var in y_pred_dict.keys():
        if var not in dataset.ann:
            print(f"[INFO] No '{var}' labels in the cohort; skipping metrics")
            continue
        ann = np.asarray(dataset.ann[var], dtype=np.float64)
        if dataset.variable_types[var] == "numerical":
            if var == surv_event_var:
                metrics = evaluate_survival(
                    y_pred_dict[var],
                    np.asarray(dataset.ann[surv_time_var]),
                    ann,
                )
            else:
                ind = ~np.isnan(ann)
                if not ind.any():
                    print(f"[INFO] All '{var}' labels missing; skipping metrics")
                    continue
                metrics = evaluate_regressor(
                    ann[ind], np.asarray(y_pred_dict[var]).ravel()[ind]
                )
        else:
            # -1 = missing/unseen level (importer/inference encoding)
            ind = ~np.isnan(ann) & (ann != -1)
            if not ind.any():
                print(
                    f"[INFO] No known '{var}' labels in the cohort (all "
                    "missing or unseen levels); skipping metrics"
                )
                continue
            metrics = evaluate_classifier(ann[ind], np.asarray(y_pred_dict[var])[ind])
        for metric, value in metrics.items():
            rows.append(
                {
                    "method": method,
                    "var": var,
                    "variable_type": dataset.variable_types[var],
                    "metric": metric,
                    "value": value,
                }
            )
    return pd.DataFrame(rows)


def get_predicted_labels(
    y_pred_dict: Dict[str, np.ndarray], dataset, split: str, method_name: str
) -> pd.DataFrame:
    """Long-format per-sample prediction table (probabilities + labels)."""
    rows = []
    n = len(dataset.samples)
    for var in y_pred_dict.keys():
        # unlabeled cohorts carry no ann for the variable: known_label
        # stays NaN, predictions are still written. Variables absent from
        # variable_types fall back to the prediction's shape (2-D
        # probabilities -> categorical).
        preds_arr = np.asarray(y_pred_dict[var])
        vtype = dataset.variable_types.get(
            var, "categorical" if preds_arr.ndim == 2 else "numerical"
        )
        if vtype == "categorical":
            probs = preds_arr
            mapping = dataset.label_mappings.get(var)

            def _name(i):
                # the head carries the reference's missing-label class when
                # training labels had NaNs (num_classes_for / reference
                # direct_pred.py:100 both count NaN as a category); its
                # mapping entry is float NaN — present it as "Unknown"
                # rather than a NaN label
                v = mapping.get(int(i), f"class_{int(i)}") if mapping else f"class_{int(i)}"
                return "Unknown" if isinstance(v, float) and np.isnan(v) else v

            class_labels = [_name(i) for i in range(probs.shape[1])]
            ann = np.asarray(
                dataset.ann.get(var, np.full(n, np.nan)), dtype=np.float64
            )
            y_true = [
                _name(v) if mapping is not None and not np.isnan(v) else np.nan
                for v in ann
            ]
            pred_idx = np.argmax(probs, axis=1)
            y_pred = [_name(i) for i in pred_idx]
            for i, sample_id in enumerate(dataset.samples):
                for j, cl in enumerate(class_labels):
                    rows.append(
                        {
                            "sample_id": sample_id,
                            "variable": var,
                            "class_label": cl,
                            "probability": float(probs[i, j]),
                            "known_label": y_true[i],
                            "predicted_label": y_pred[i],
                            "split": split,
                            "method": method_name,
                        }
                    )
        else:
            ann = np.asarray(
                dataset.ann.get(var, np.full(n, np.nan)), dtype=np.float64
            )
            preds = preds_arr.ravel()
            for i, sample_id in enumerate(dataset.samples):
                rows.append(
                    {
                        "sample_id": sample_id,
                        "variable": var,
                        "class_label": np.nan,
                        "probability": np.nan,
                        "known_label": float(ann[i]),
                        "predicted_label": float(preds[i]),
                        "split": split,
                        "method": method_name,
                    }
                )
    return pd.DataFrame(rows)
