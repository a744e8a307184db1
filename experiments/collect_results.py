"""Harvest final metrics from experiments/log/train_*.log into one table.

Each training log ends with the reference-format footer
(train.py prints: "Min Relative Val L2 Error: X %", "Relative Test L2
Error: X %", "Elapsed Time : S").  This collects every completed at-scale
run into a single markdown table (task, model, val/test relative L2,
wall-clock) so RESULTS.md can carry one master inventory instead of
per-queue snippets.  Logs without a footer (in-flight or killed runs)
are listed as pending.

Usage: python experiments/collect_results.py [--update]
  --update rewrites the MASTER TABLE block in RESULTS.md in place
  (between the '<!-- master-table:begin -->' / 'end' markers).
"""
import glob
import os
import re
import sys

# log filename -> (task, model, note). Filenames encode task first; the
# suffix names the model or the run variant.
RUNS = {
    # NB: the round-1 E1/MSMP-PDE headline lives in STATIC_ROWS (its log was
    # rotated out); don't also map "train_E1.log" here or a regenerated log
    # under that name would duplicate the row — an unmapped log shows up in
    # the "unknown" listing instead, which is the safe failure mode.
    "train_E1_pair.log": ("E1", "MSMP-PDE", "fused gated-pair kernel (production auto)"),
    "train_E1_MPPDE.log": ("E1", "MP-PDE", "plain-MP ablation baseline"),
    "train_E1_Gated.log": ("E1", "Gated", "gate, no temporal encoder"),
    "train_E1_LSTMGated.log": ("E1", "LSTMGated", "gate + LSTM encoder"),
    "train_E1_MSGMP.log": ("E1", "MSGMP-PDE", "GLU decoder variant"),
    "train_E1_MSSMP.log": ("E1", "MSSMP-PDE", "twin-tower scale/diff"),
    "train_E1_SaveMSMP.log": ("E1", "SaveMSMP-PDE", "stateful LEM across windows"),
    "train_E1_LEM.log": ("E1", "LEM", "pure-recurrent, no GNN"),
    "train_E1_LSTM.log": ("E1", "LSTM", "pure-recurrent, no GNN"),
    "train_E1_Gated_s1.log": ("E1", "Gated", "seed 1 (noise estimate)"),
    "train_E1_LSTMGated_s1.log": ("E1", "LSTMGated", "seed 1 (noise estimate)"),
    "train_E1_MSMP_s1.log": ("E1", "MSMP-PDE", "seed 1 (noise estimate)"),
    "train_E1_MPPDE_s1.log": ("E1", "MP-PDE", "seed 1 (noise estimate)"),
    "train_E1_BaseCNN.log": ("E1", "BaseCNN", ""),
    "train_E1_FNO.log": ("E1", "FNO", ""),
    "train_E1_VNO.log": ("E1", "VNO", "nonequispaced FNO"),
    "train_E1_torchref.log": ("E1", "MSMP-PDE", "trained on torch-reference-generated data"),
    "train_E2.log": ("E2", "MSMP-PDE", ""),
    "train_E3.log": ("E3", "MSMP-PDE", ""),
    "train_E3_FNOP.log": ("E3", "FNOP", "param-conditioned FNO"),
    "train_kdv.log": ("kdv", "MSMP-PDE", "reference schedule"),
    "train_kdv_long.log": ("kdv", "MSMP-PDE", "30 epochs, late milestones"),
    "train_kdv_tw50.log": ("kdv", "MSMP-PDE", "tw=50 (best kdv)"),
    "train_kdv_FNO.log": ("kdv", "FNO", "cross-model bound"),
    "train_kdv_BaseCNN.log": ("kdv", "BaseCNN", "cross-model bound"),
    "train_WE1.log": ("WE1", "MSMP-PDE", ""),
    "train_WE2.log": ("WE2", "MSMP-PDE", ""),
    "train_WE3.log": ("WE3", "MSMP-PDE", ""),
    "train_KF.log": ("KF", "MSMP-PDE", ""),
    "train_KS.log": ("KS", "MSMP-PDE", "chaotic; see short-horizon metric"),
    "train_KS_r3.log": ("KS", "MSMP-PDE", "chaotic: full-horizon rel L2; short-horizon (2 Lyapunov times) = 15.8%"),
    "train_RP.log": ("RP", "FNO2DP", ""),
    "train_RP_FNO2DP.log": ("RP", "FNO2DP", ""),
    "train_RPU_30.log": ("RPU", "MSMP-PDE2D", "direct on unstructured grid, 30 epochs"),
    "train_RPU_I.log": ("RPU", "MSMP-PDE2D", "interpolated *_I pipeline (r4g TPU rerun); interp-back 6.84%, uniform-route 6.16% (eval_interp_RPU_tpu.log)"),
    "train_RPU_FNO2DPU.log": ("RPU", "FNO2DPU", "unstructured FNO"),
    "train_MSWG.log": ("MSWG", "MSMP-PDE2D", ""),
    "train_MSWG_BaseCNN2D.log": ("MSWG", "BaseCNN2D", ""),
    "train_MSWG_FNO2D.log": ("MSWG", "FNO2D", ""),
    "train_MSWG3.log": ("MSWG3", "MSMP-PDE2D", ""),
    "train_MSWG3_MSG2.log": ("MSWG3", "MSG2-PDE2D", "gradient gate"),
    "train_MSWG3_GLEM.log": ("MSWG3", "GLEMGated2D", "attention path (upstream dead code)"),
    "train_MSWG3_MPPDE2D.log": ("MSWG3", "MP-PDE2D", "plain-MP 2D ablation baseline"),
    "train_MSWG3_Gated2D.log": ("MSWG3", "Gated2D", "gate, no temporal encoder"),
    "train_MSWG3_LSTMGated2D.log": ("MSWG3", "LSTMGated2D", "gate + LSTM encoder"),
    "train_MSWG3_MSGMP2D.log": ("MSWG3", "MSGMP-PDE2D", "GLU decoder variant"),
    "train_MSWG3_SaveMSMP2D.log": ("MSWG3", "SaveMSMP-PDE2D", "stateful LEM"),
    "train_MSWG3_LEM2D.log": ("MSWG3", "LEM2D", "pure-recurrent, no GNN"),
    "train_MSWG3_LSTM2D.log": ("MSWG3", "LSTM2D", "pure-recurrent, no GNN"),
    "train_MSWG3_torchref.log": ("MSWG3", "MSMP-PDE2D", "trained on torch-reference-generated data"),
    # round-4 queue (tpu_queue_r4a.sh)
    "train_KS_20ep.log": ("KS", "MSMP-PDE", "reference 20-epoch schedule; chaotic full-horizon — short-horizon (2 windows) 7.17%"),
    "train_E1_MPPDE_s2.log": ("E1", "MP-PDE", "seed 2 (noise estimate)"),
    "train_E1_Gated_s2.log": ("E1", "Gated", "seed 2 (noise estimate)"),
    "train_E1_MSMP_s2.log": ("E1", "MSMP-PDE", "seed 2 (noise estimate)"),
    "train_MSWG3_MSMP2D_s1.log": ("MSWG3", "MSMP-PDE2D", "seed 1 (noise estimate)"),
    "train_MSWG3_MSMP2D_s2.log": ("MSWG3", "MSMP-PDE2D", "seed 2 (noise estimate)"),
    "train_MSWG3_MSG2_s1.log": ("MSWG3", "MSG2-PDE2D", "seed 1 (noise estimate)"),
    "train_MSWG3_MSG2_s2.log": ("MSWG3", "MSG2-PDE2D", "seed 2 (noise estimate)"),
    # round-4f recovery queue: s0 RERUNS on the freshly generated TPU-f32
    # data (the Aug-18 re-image wiped data/ — seed spreads must not mix
    # data provenance, so each replicate set gets its own s0 base; note
    # deliberately avoids the substring "seed" to stay out of the
    # seed_spread replicate groups, which prepend the base via SEED_BASE)
    "train_E1_MSMP_s0.log": ("E1", "MSMP-PDE", "s0 base, fresh TPU-f32 data, post-LEM-flip"),
    "train_E1_Gated_s0.log": ("E1", "Gated", "s0 base, fresh TPU-f32 data"),
    "train_E1_MPPDE_s0.log": ("E1", "MP-PDE", "s0 base, fresh TPU-f32 data"),
    "train_MSWG3_MSMP2D_s0.log": ("MSWG3", "MSMP-PDE2D", "s0 base, fresh TPU-f32 data"),
    "train_MSWG3_MSG2_s0.log": ("MSWG3", "MSG2-PDE2D", "s0 base, fresh TPU-f32 data"),
    # round-5 queue: KS cross-data interchange pair (VERDICT r4 #5) —
    # matched 128/16/16 sample budget (the torch-reference KS regen is
    # CPU-bound; 2048 samples is ~days), 20 epochs, short_horizon_windows=2.
    # Full-horizon rel-L2 saturates ~90% by chaos; the comparable number is
    # the short-horizon metric carried in the note.
    "train_KS_torchref.log": ("KS", "MSMP-PDE", "trained on torch-reference-generated data (128-sample matched budget); chaotic full-horizon — short-horizon (2 windows) 34.88%"),
    "train_KS_s128.log": ("KS", "MSMP-PDE", "own-data 128-sample control for the torch-data row; short-horizon (2 windows) 33.31%"),
    # round-5b accuracy queue (tpu_queue_r5b.sh): error bars for the best
    # single-seed claims + gate-only variants on the hardest tasks
    "train_MSWG3_Gated2D_s1.log": ("MSWG3", "Gated2D", "seed 1 (noise estimate)"),
    "train_MSWG3_Gated2D_s2.log": ("MSWG3", "Gated2D", "seed 2 (noise estimate)"),
    "train_kdv_Gated_tw50.log": ("kdv", "Gated", "tw=50, gate-only"),
    "train_E3_Gated.log": ("E3", "Gated", "gate, no temporal encoder"),
    "train_KS_Gated_20ep.log": ("KS", "Gated", "reference 20-epoch schedule; gate-only; chaotic full-horizon — short-horizon (2 windows) 7.86% test"),
    # round-5c: replicates for the surprise MSWG3 winner (MSGMP-PDE2D 2.85%)
    "train_MSWG3_MSGMP2D_s1.log": ("MSWG3", "MSGMP-PDE2D", "seed 1 (noise estimate)"),
    "train_MSWG3_MSGMP2D_s2.log": ("MSWG3", "MSGMP-PDE2D", "seed 2 (noise estimate)"),
    # E1 GLU-decoder on the fresh TPU-f32 data (the 6.92% static row is
    # r3-data; "seed" kept out of the note so no spread mixes provenance)
    "train_E1_MSGMP_s1.log": ("E1", "MSGMP-PDE", "fresh TPU-f32 data replicate (s1)"),
}

TASK_ORDER = ["E1", "E2", "E3", "kdv", "WE1", "WE2", "WE3", "KF", "KS",
              "RP", "RPU", "MSWG", "MSWG3"]

# Rows from rounds 1-2 whose logs were rotated out of experiments/log/
# before this collector existed; values as recorded in RESULTS.md (the
# "All 12 TaskIDs" table) at the time. (task, model, note, val, test, min)
STATIC_ROWS = [
    ("E1", "MSMP-PDE", "round-1 headline (beats numerical baseline)",
     None, 6.76, 72),
    ("E2", "MSMP-PDE", "round 1", None, 6.46, 45),
    ("WE1", "MSMP-PDE", "round 2", None, 1.46, 49),
    ("RP", "FNO2DP", "round 1", None, 1.72, 6),
    ("MSWG3", "MSMP-PDE2D", "round 1 (incl. mid-training resume)",
     None, 5.37, 84),
    # round-3 rows whose logs were deleted by the Aug-18 host re-image
    # (values as recorded in the master table at commit 9dc8a73). The E1
    # LSTM cut row is NOT carried — its r4f rerun supersedes it.
    ("E1", "Gated", "gate, no temporal encoder", 6.62, 6.32, 28),
    ("E1", "LSTMGated", "gate + LSTM encoder", 7.04, 6.57, 32),
    ("E1", "MSMP-PDE", "trained on torch-reference-generated data",
     6.87, 6.57, 51),
    ("E1", "MSMP-PDE", "fused gated-pair kernel (production auto)",
     6.90, 6.86, 29),
    ("E1", "MSGMP-PDE", "GLU decoder variant", 7.16, 6.92, 53),
    ("E1", "LEM", "pure-recurrent, no GNN", 7.48, 7.51, 22),
    ("E1", "MP-PDE", "plain-MP ablation baseline", 7.49, 7.65, 48),
    ("E1", "MSSMP-PDE", "twin-tower scale/diff", 7.99, 7.68, 62),
    ("E1", "BaseCNN", "", 8.67, 8.68, 6),
    ("E1", "SaveMSMP-PDE", "stateful LEM across windows", 8.85, 9.28, 29),
    ("E1", "FNO", "", 10.77, 11.37, 6),
    ("E1", "VNO", "nonequispaced FNO", 18.45, 17.95, 5),
    ("E3", "FNOP", "param-conditioned FNO", 11.28, 10.63, 7),
    ("E3", "MSMP-PDE", "", 10.89, 10.92, 32),
    ("kdv", "MSMP-PDE", "tw=50 (best kdv)", 18.82, 16.17, 44),
    ("kdv", "FNO", "cross-model bound", 22.37, 18.16, 7),
    ("kdv", "MSMP-PDE", "30 epochs, late milestones", 23.32, 20.12, 41),
    ("kdv", "MSMP-PDE", "reference schedule", 26.40, 22.24, 42),
    ("kdv", "BaseCNN", "cross-model bound", 50.97, 47.53, 4),
    ("WE2", "MSMP-PDE", "", 1.09, 1.09, 29),
    ("WE3", "MSMP-PDE", "", 2.85, 2.79, 28),
    ("KF", "MSMP-PDE", "", 1.12, 0.76, 30),
    ("KS", "MSMP-PDE", "5-epoch checkpoint: full-horizon rel L2; "
     "short-horizon (2 Lyapunov times) = 15.8%", 76.98, 79.44, 14),
    # (the r3 FNO2DPU cut row — 2.05% best-val at the CPU-outage pace —
    # is retired: the r5 on-chip run completed all 20 epochs at 2.07%)
    ("RPU", "MSMP-PDE2D", "interpolated *_I pipeline (r3); "
     "7.60% interpolated-back", 6.29, 6.88, 33),
    ("RPU", "MSMP-PDE2D", "direct on unstructured grid, 30 epochs",
     6.74, 8.04, 43),
    ("MSWG", "MSMP-PDE2D", "", 0.83, 1.12, 35),
    ("MSWG", "BaseCNN2D", "", 6.17, 6.47, 5),
    # (the r3 "(best MSWG3)" tag is retired: Gated2D reads 3.87% — seed
    # replicates for it land via tpu_queue_r5b.sh)
    ("MSWG3", "MSG2-PDE2D", "gradient gate", 5.14, 4.52, 40),
    ("MSWG3", "MSMP-PDE2D", "trained on torch-reference-generated data",
     4.22, 5.09, 40),
    ("MSWG3", "GLEMGated2D", "attention path (upstream dead code)",
     48.48, 50.16, 35),
]

BEGIN = "<!-- master-table:begin -->"
END = "<!-- master-table:end -->"


def harvest(log_dir="experiments/log"):
    rows, pending, unknown = [], [], []
    for f in sorted(glob.glob(os.path.join(log_dir, "train_*.log"))):
        base = os.path.basename(f)
        meta = RUNS.get(base)
        if meta is None:
            # h2h / shim runs live in their own RESULTS section
            if "h2h" not in base:
                unknown.append(base)
            continue
        txt = open(f, errors="replace").read()
        val = re.findall(r"Min Relative Val L2 Error: ([\d.]+) %", txt)
        test = re.findall(r"Relative Test L2 Error: ([\d.]+) %", txt)
        el = re.findall(r"Elapsed Time : ([\d.]+)", txt)
        if val and test:
            rows.append((*meta, float(val[-1]), float(test[-1]),
                         float(el[-1]) / 60 if el else float("nan"), base))
            continue
        # run cut before the footer (timeout/outage): the per-epoch
        # best-val blocks print valid-then-test "L2 relative error" pairs
        # (training/train.py:190-199) — harvest the last COMPLETE pair,
        # anchored on the *Valid*/*Test* markers (a run cut between the two
        # prints must not pair a stale test with a fresh valid value)
        pairs = re.findall(
            r"\*Valid\*\nL2 error [\d.e+-]+\nL2 relative error ([\d.]+) %\n"
            r"\*Test\*\nL2 error [\d.e+-]+\nL2 relative error ([\d.]+) %",
            txt,
        )
        # a footerless log still being written (mtime < 30 min) is an
        # in-flight run, not a cut one — list it as pending instead of
        # publishing a misleading "cut" row
        import time
        in_flight = time.time() - os.path.getmtime(f) < 1800
        if pairs and "Saved model at" in txt and not in_flight:
            task, model, note = meta
            note = (note + "; " if note else "") + \
                "best-val checkpoint metrics — run cut before completion"
            rows.append((task, model, note, float(pairs[-1][0]),
                         float(pairs[-1][1]), float("nan"), base))
        else:
            pending.append((*meta, base))
    rows.extend((t, m, n, v, test, mins, "(RESULTS.md)")
                for t, m, n, v, test, mins in STATIC_ROWS)
    rows.sort(key=lambda r: (TASK_ORDER.index(r[0]), r[4]))
    return rows, pending, unknown


# seed-0 base log per replicate group (several non-seed rows can share a
# (task, model) — e.g. torch-data and ablation rows — so the base is named
# explicitly)
SEED_BASE = {
    # post-re-image: bases are the s0 reruns on the fresh TPU-f32 data
    # (the r3 base logs were wiped and their rows carried to STATIC_ROWS;
    # mixing them into spreads would conflate data provenance with seed
    # noise)
    ("E1", "MP-PDE"): "train_E1_MPPDE_s0.log",
    ("E1", "Gated"): "train_E1_Gated_s0.log",
    ("E1", "LSTMGated"): "train_E1_LSTMGated.log",
    ("E1", "MSMP-PDE"): "train_E1_MSMP_s0.log",
    ("MSWG3", "MSMP-PDE2D"): "train_MSWG3_MSMP2D_s0.log",
    ("MSWG3", "MSG2-PDE2D"): "train_MSWG3_MSG2_s0.log",
    # Gated2D s0 = the r4g run (same fresh TPU-f32 data generation as the
    # other MSWG3 bases — data/ was regenerated before any MSWG3 rerun)
    ("MSWG3", "Gated2D"): "train_MSWG3_Gated2D.log",
    # MSGMP2D s0 = the r5 registry-completeness run (same fresh data)
    ("MSWG3", "MSGMP-PDE2D"): "train_MSWG3_MSGMP2D.log",
}


def seed_spread(rows):
    """Mean ± std across seed replicates: groups a model's seed-N rows
    ("seed" in the note) with its seed-0 base row (SEED_BASE) on the same
    task. Returns markdown lines (empty when no group has >= 2 seeds)."""
    import statistics

    groups = {}
    for task, model, note, val, test, mins, base in rows:
        if "seed" in note:
            groups.setdefault((task, model), {})[note] = test
    lines = []
    for (task, model), seeds in sorted(groups.items()):
        base_log = SEED_BASE.get((task, model))
        base_row = [r for r in rows if r[6] == base_log]
        tests = sorted(seeds.values())
        if base_row:
            tests = [base_row[0][4]] + tests
        if len(tests) < 2:
            continue
        mu = statistics.mean(tests)
        sd = statistics.stdev(tests)
        lines.append(
            f"| {task} | {model} | {len(tests)} | {mu:.2f}% ± {sd:.2f}pp "
            f"| {min(tests):.2f}–{max(tests):.2f}% |"
        )
    if not lines:
        return []
    return ["", "**Seed spread** (test rel L2 across seeds, incl. the "
            "seed-0 master-table row):", "",
            "| task | model | seeds | mean ± std | range |",
            "|---|---|---|---|---|"] + lines


def render(rows, pending):
    out = [BEGIN,
           "",
           "| task | model | val rel L2 | test rel L2 | wall-clock | note |",
           "|---|---|---|---|---|---|"]
    for task, model, note, val, test, mins, base in rows:
        v = f"{val:.2f}%" if val is not None else "—"
        wall = f"{mins:.0f} min" if mins == mins else "—"
        out.append(f"| {task} | {model} | {v} | **{test:.2f}%** | "
                   f"{wall} | {note} |")
    out.extend(seed_spread(rows))
    if pending:
        out.append("")
        out.append("In flight / not yet recorded: " + ", ".join(
            f"{m} on {t}" for t, m, _, _ in pending))
    out.append("")
    out.append(END)
    return "\n".join(out)


def main():
    rows, pending, unknown = harvest()
    table = render(rows, pending)
    if unknown:
        print("WARNING: logs without a RUNS entry:", unknown, file=sys.stderr)
    if "--update" in sys.argv:
        text = open("RESULTS.md").read()
        i, j = text.index(BEGIN), text.index(END) + len(END)
        open("RESULTS.md", "w").write(text[:i] + table + text[j:])
        print(f"RESULTS.md master table updated: {len(rows)} rows, "
              f"{len(pending)} pending")
    else:
        print(table)


if __name__ == "__main__":
    main()
