#!/usr/bin/env python3
"""Floor-drift gate for the no-oracle containment differentials.

The 14 no-oracle queries are verified by 3-SF floors in
CONTAINMENT_r{N}.json; until r18 a silent float drift between rounds
was only caught by judge eyeball (r17 verdict task 6). This script
diffs the current artifact against the previous round's and exits
non-zero on any DIRECTIONAL regression:

- quality metrics (recall*, precision, rep_agree, cells_covered,
  exact_j05_recall) must not DECREASE beyond tolerance;
- error metrics (max_rel_err, rel_err, over_merged_clusters,
  max_cell_share_*) must not INCREASE beyond tolerance;
- count metrics (rows, pairs, exact_pairs) are deterministic on fixed
  fixtures and must be EQUAL (they drift only when code or fixtures
  change semantics — either way, loudly).

Missing queries/SFs/metrics in the new artifact also fail (a gate that
silently narrows is no gate). New metrics/queries are allowed and
reported.

Intentional, explained changes (e.g. a banding derivation that finds
MORE pairs) are acknowledged per-cell: `--allow q/sf/metric` downgrades
that one regression to a note — the acknowledgment lives in the close
command line next to its BASELINE.md justification, never as a silent
default.

Usage: containment_diff.py NEW_JSON OLD_JSON [--tol=1e-9]
       [--allow q/sf/metric ...]
Self-test: containment_diff.py --selftest  (plants a decrease, expects red)
"""
import json
import sys

HIGHER_IS_BETTER = {
    "recall", "recall_at_5", "precision", "rep_agree", "cells_covered",
    "exact_j05_recall",
}
LOWER_IS_BETTER = {
    "max_rel_err", "rel_err", "over_merged_clusters",
    "max_cell_share_corpus", "max_cell_share_sample",
}
EXACT = {"rows", "pairs", "exact_pairs"}


def diff(new, old, tol, allow=frozenset()):
    """Return (failures, notes). Pure for the selftest. `allow` holds
    "q/sf/metric" cells whose regression is acknowledged (downgraded to
    a note)."""
    failures, notes = [], []

    def fail(cell, msg):
        (notes if cell in allow else failures).append(
            msg + (" [allowed]" if cell in allow else ""))
    for q, sfs in old.items():
        if q not in new:
            failures.append(f"{q}: missing from new artifact")
            continue
        for sf, metrics in sfs.items():
            if sf not in new[q]:
                failures.append(f"{q}/{sf}: missing from new artifact")
                continue
            for m, ov in metrics.items():
                if m not in new[q][sf]:
                    failures.append(f"{q}/{sf}/{m}: metric dropped")
                    continue
                nv = new[q][sf][m]
                if m in HIGHER_IS_BETTER:
                    if nv < ov - tol:
                        fail(f"{q}/{sf}/{m}",
                             f"{q}/{sf}/{m}: floor DECREASED {ov} -> {nv}")
                    elif nv > ov + tol:
                        notes.append(f"{q}/{sf}/{m}: improved {ov} -> {nv}")
                elif m in LOWER_IS_BETTER:
                    if nv > ov + tol:
                        fail(f"{q}/{sf}/{m}",
                             f"{q}/{sf}/{m}: error INCREASED {ov} -> {nv}")
                    elif nv < ov - tol:
                        notes.append(f"{q}/{sf}/{m}: improved {ov} -> {nv}")
                elif m in EXACT:
                    if nv != ov:
                        fail(f"{q}/{sf}/{m}",
                             f"{q}/{sf}/{m}: deterministic count changed "
                             f"{ov} -> {nv}")
                else:
                    failures.append(
                        f"{q}/{sf}/{m}: metric not classified in "
                        "containment_diff.py - add it to a direction set")
    for q in new:
        if q not in old:
            notes.append(f"{q}: new query (no baseline)")
    return failures, notes


def selftest():
    old = {"q": {"sf0.1": {"recall": 0.95, "max_rel_err": 0.01,
                           "rows": 10.0}}}
    # planted: recall decrease must be red
    f, _ = diff({"q": {"sf0.1": {"recall": 0.94, "max_rel_err": 0.01,
                                 "rows": 10.0}}}, old, 1e-9)
    assert f and "DECREASED" in f[0], f
    # planted: error increase must be red
    f, _ = diff({"q": {"sf0.1": {"recall": 0.95, "max_rel_err": 0.02,
                                 "rows": 10.0}}}, old, 1e-9)
    assert f and "INCREASED" in f[0], f
    # planted: count drift must be red
    f, _ = diff({"q": {"sf0.1": {"recall": 0.95, "max_rel_err": 0.01,
                                 "rows": 11.0}}}, old, 1e-9)
    assert f and "count changed" in f[0], f
    # planted: dropped metric / sf / query must be red
    f, _ = diff({"q": {"sf0.1": {"recall": 0.95, "rows": 10.0}}}, old, 1e-9)
    assert f and "dropped" in f[0], f
    f, _ = diff({}, old, 1e-9)
    assert f and "missing" in f[0], f
    # unclassified metric must be red (future-proofing)
    f, _ = diff({"q": {"sf0.1": {"recall": 0.95, "max_rel_err": 0.01,
                                 "rows": 10.0, "weird": 1.0}}},
                {"q": {"sf0.1": {"weird": 1.0}}}, 1e-9)
    assert f and "not classified" in f[0], f
    # identical artifacts pass; improvements are notes, not failures
    f, n = diff(old, old, 1e-9)
    assert not f, f
    f, n = diff({"q": {"sf0.1": {"recall": 0.99, "max_rel_err": 0.001,
                                 "rows": 10.0}}}, old, 1e-9)
    assert not f and len(n) == 2, (f, n)
    # an --allow'd cell downgrades to a note; everything else stays red
    f, n = diff({"q": {"sf0.1": {"recall": 0.95, "max_rel_err": 0.01,
                                 "rows": 11.0}}}, old, 1e-9,
                frozenset({"q/sf0.1/rows"}))
    assert not f and any("[allowed]" in x for x in n), (f, n)
    f, _ = diff({"q": {"sf0.1": {"recall": 0.94, "max_rel_err": 0.01,
                                 "rows": 11.0}}}, old, 1e-9,
                frozenset({"q/sf0.1/rows"}))
    assert f and "DECREASED" in f[0], f
    print("selftest PASS (all planted regressions caught)")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return 0
    argv = sys.argv[1:]
    tol = 1e-9
    allow = set()
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--tol="):
            tol = float(a.split("=", 1)[1])
        elif a == "--allow":
            i += 1
            allow.add(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    new = json.load(open(args[0]))
    old = json.load(open(args[1]))
    failures, notes = diff(new, old, tol, frozenset(allow))
    for n in notes:
        print(f"NOTE {n}")
    for f in failures:
        print(f"FAIL {f}")
    if failures:
        print(f"{len(failures)} floor regression(s) vs {args[1]}")
        return 1
    print(f"ALL FLOORS HOLD ({args[0]} vs {args[1]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
