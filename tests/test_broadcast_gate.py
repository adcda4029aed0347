"""Broadcast-HINT gate (r9 verdict directive #2): every ``F.broadcast``
call site in the package must be classified in
``tools/audit_broadcasts.ALLOWED`` as one of the legal classes
(fixed dim / model aggregate / probe set / 1-row scalar /
threshold-bounded skew frame).  r7 audited 141 hints by hand; r9
reintroduced one corpus-vocab hint (q_pmi_collocations) and nothing
caught it — this makes the classification machine-checked so
class-(c) hints cannot re-enter silently.

No Spark session needed: the gate is a pure-AST source scan, which is
the point — a forced hint and a planner-chosen broadcast look the same
in the physical plan, so only source level can see the override."""

from __future__ import annotations

import os
import tempfile
import textwrap

from tools.audit_broadcasts import ALLOWED, LEGAL_CLASSES, audit, scan_sites


def test_every_broadcast_hint_is_classified():
    unlisted, stale, bad_class = audit()
    assert unlisted == [], (
        "NEW F.broadcast hint site(s) without a classification — add to "
        "tools/audit_broadcasts.ALLOWED with a legal class and reason, "
        "or (if the frame is corpus-explode / unbounded-groupBy derived) "
        f"drop the hint and let the planner choose: {unlisted}"
    )
    assert stale == [], (
        f"allowlist entries no longer matching any source site: {stale}"
    )
    assert bad_class == [], f"illegal classification class: {bad_class}"


def test_allowlist_classes_and_reasons_are_wellformed():
    for key, (cls, reason) in ALLOWED.items():
        assert cls in LEGAL_CLASSES, f"{key}: class {cls!r}"
        assert len(reason) >= 10, f"{key}: reason too thin to review"


def test_scanner_catches_the_pmi_regression_shape():
    """The exact r9 defect, reduced: force-broadcasting a groupBy-built
    unigram vocabulary onto the bigram table.  The scanner must surface
    both sites (they would then fail the allowlist check), including
    the hint buried inside a method-chain argument."""
    snippet = textwrap.dedent(
        """
        from pyspark.sql import functions as F

        def q_pmi(docs):
            uni = docs.groupBy("w").count()
            ua = uni.select("w")
            big = docs.join(F.broadcast(ua), "a")
            return big.join(F.broadcast(uni.select("w")), "b")
        """
    )
    with tempfile.TemporaryDirectory() as td:
        pkg = os.path.join(td, "pkg")
        os.makedirs(pkg)
        with open(os.path.join(pkg, "mod.py"), "w", encoding="utf-8") as fh:
            fh.write(snippet)
        sites = scan_sites(pkg)
    keys = sorted(k for k, _ in sites)
    assert keys == [
        "pkg/mod.py::q_pmi::ua",
        "pkg/mod.py::q_pmi::uni.select('w')",
    ]


def test_scanner_ignores_pickle_broadcast_variables():
    """sc.broadcast(...) is the driver-side pickle mechanism with its
    own size discipline — not a join hint; it must not be flagged."""
    snippet = "def f(sc, cfg):\n    return sc.broadcast(cfg)\n"
    with tempfile.TemporaryDirectory() as td:
        pkg = os.path.join(td, "pkg")
        os.makedirs(pkg)
        with open(os.path.join(pkg, "mod.py"), "w", encoding="utf-8") as fh:
            fh.write(snippet)
        assert scan_sites(pkg) == []
