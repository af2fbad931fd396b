"""Conformance sweep over the reference's inline RSpec test tables.

Aggregate pass-rate gates (not per-case tests): each suite must stay
at or above its measured floor and must produce ZERO crashes
(non-JsonLdError exceptions). Raising a floor after improving the core
is encouraged; lowering one is a regression.

Case data: harvested at test time from /root/reference/spec/*.rb (see
tests/spec_harvest.py). rdfstar and option-bearing cases we don't
model are excluded up front.
"""

from __future__ import annotations

import pytest

from spec_harvest import harvest, norm, parse_json_fields

from json_ld_spark.core import api
from json_ld_spark.core.errors import JsonLdError


def _run_suite(spec_file, runner, floor):
    raw = harvest(spec_file)
    passed = failed = crashed = skipped = 0
    failures = []
    for case in raw:
        if case["unsupported"]:
            skipped += 1
            continue
        case = parse_json_fields(case)
        if case is None:
            skipped += 1
            continue
        try:
            ok = runner(case)
            if ok is None:
                skipped += 1
            elif ok:
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], "mismatch"))
        except JsonLdError as e:
            if case["exception"]:
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], f"JsonLdError {e.code}"))
        except RecursionError:
            failed += 1
            failures.append((case["title"], "RecursionError"))
        except Exception as e:  # crash = hard failure
            crashed += 1
            failures.append((case["title"], f"CRASH {type(e).__name__}: {e}"))
    total = passed + failed + crashed
    rate = passed / total if total else 1.0
    detail = "\n".join(f"  - {t}: {why}" for t, why in failures[:30])
    assert crashed == 0, f"{spec_file}: {crashed} crashes\n{detail}"
    assert rate >= floor, (
        f"{spec_file}: pass rate {rate:.3f} < floor {floor} "
        f"(pass={passed} fail={failed} skip={skipped})\n{detail}"
    )


def _opts(case):
    kw = {}
    if case["base"]:
        kw["base"] = case["base"]
    if case["processing_mode"]:
        kw["processing_mode"] = case["processing_mode"]
    if (case.get("ruby_opts") or {}).get("rdfstar"):
        kw["rdfstar"] = True
    return kw


def test_expand_spec_suite():
    def run(case):
        got = api.expand(case["input"], **_opts(case))
        if case["exception"] and case["output"] is None:
            return False  # expected an error, got a result
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    _run_suite("expand_spec.rb", run, floor=0.995)


def test_compact_spec_suite():
    def run(case):
        ctx = case["context"]
        if ctx is None:
            return None
        got = api.compact(case["input"], ctx, **_opts(case))
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    _run_suite("compact_spec.rb", run, floor=0.98)


def test_flatten_spec_suite():
    def run(case):
        got = api.flatten(case["input"], case["context"], **_opts(case))
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    _run_suite("flatten_spec.rb", run, floor=0.99)


def test_to_rdf_spec_suite():
    """JSON→Turtle tables from to_rdf_spec.rb, compared under graph
    isomorphism (the reference's be_equivalent_graph semantics)."""
    from spec_harvest import harvest_to_rdf, parse_turtle

    from json_ld_spark.core.rdf import isomorphic

    passed = failed = crashed = skipped = 0
    failures = []
    for case in harvest_to_rdf():
        if case["unsupported"]:
            skipped += 1
            continue
        try:
            doc = __import__("json").loads(case["input"])
        except ValueError:
            skipped += 1
            continue
        want = parse_turtle(
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . " + case["ttl"]
        )
        try:
            got = api.to_rdf(doc, **case["opts"])
            if isomorphic(got, want):
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], "graph mismatch"))
        except JsonLdError as e:
            failed += 1
            failures.append((case["title"], f"JsonLdError {e.code}"))
        except Exception as e:
            crashed += 1
            failures.append((case["title"], f"CRASH {type(e).__name__}: {e}"))
    total = passed + failed + crashed
    rate = passed / total if total else 1.0
    detail = "\n".join(f"  - {t}: {why}" for t, why in failures[:30])
    assert crashed == 0, f"to_rdf: {crashed} crashes\n{detail}"
    assert rate >= 0.95, (
        f"to_rdf pass rate {rate:.3f} (pass={passed} fail={failed} "
        f"skip={skipped})\n{detail}"
    )


def test_from_rdf_spec_suite():
    """Turtle→expanded-JSON cases from from_rdf_spec.rb."""
    from spec_harvest import harvest_from_rdf, parse_turtle

    passed = failed = crashed = 0
    failures = []
    for case in harvest_from_rdf():
        try:
            triples = parse_turtle(case["ttl"])
            got = api.from_rdf(triples, ordered=True, **case["opts"])
            if norm(got) == norm(case["output"]):
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], "mismatch"))
        except Exception as e:
            crashed += 1
            failures.append((case["title"], f"CRASH {type(e).__name__}: {e}"))
    detail = "\n".join(f"  - {t}: {w}" for t, w in failures)
    assert crashed == 0 and passed / (passed + failed) >= 0.95, (
        f"from_rdf pass={passed} fail={failed} crash={crashed}\n{detail}"
    )


def test_frame_spec_suite():
    """input+frame→output cases from frame_spec.rb (processingMode
    defaults to json-ld-1.0 per the spec's do_frame helper)."""
    passed = failed = crashed = skipped = 0
    failures = []
    for c0 in harvest("frame_spec.rb"):
        if c0["unsupported"]:
            skipped += 1
            continue
        case = parse_json_fields(c0)
        if case is None or case["frame"] is None or case["output"] is None:
            skipped += 1
            continue
        kw = dict(case.get("ruby_opts") or {})
        if case["base"]:
            kw["base"] = case["base"]
        kw["processing_mode"] = case["processing_mode"] or "json-ld-1.0"
        try:
            got = api.frame(case["input"], case["frame"], **kw)
            if norm(got) == norm(case["output"]):
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], "mismatch"))
        except JsonLdError as e:
            if case["exception"]:
                passed += 1
            else:
                failed += 1
                failures.append((case["title"], f"JsonLdError {e.code}"))
        except Exception as e:
            crashed += 1
            failures.append((case["title"], f"CRASH {type(e).__name__}: {e}"))
    total = passed + failed + crashed
    detail = "\n".join(f"  - {t}: {w}" for t, w in failures[:30])
    assert total >= 40, f"frame harvest found too few cases ({total})"
    assert crashed == 0, f"frame: {crashed} crashes\n{detail}"
    rate = passed / total
    assert rate >= 0.98, (
        f"frame pass rate {rate:.3f} (pass={passed} fail={failed} "
        f"skip={skipped})\n{detail}"
    )


def test_expand_spec_suite_ordered():
    """Ordered variant (suite_expand_spec.rb:12-33 runs both modes)."""
    def run(case):
        got = api.expand(case["input"], ordered=True, **_opts(case))
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    _run_suite("expand_spec.rb", run, floor=0.995)


def test_compact_spec_suite_ordered():
    def run(case):
        if case["context"] is None:
            return None
        got = api.compact(case["input"], case["context"], ordered=True,
                          **_opts(case))
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    _run_suite("compact_spec.rb", run, floor=0.98)
