"""Generate CONFORMANCE.md — the EARL-report analog (the reference
ships etc/earl.jsonld; same idea, markdown, produced by running every
harvested suite live).

Run: python scripts/conformance_report.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    from spec_harvest import (
        harvest,
        harvest_from_rdf,
        harvest_to_rdf,
        norm,
        parse_json_fields,
        parse_turtle,
    )

    from json_ld_spark.core import api
    from json_ld_spark.core.errors import JsonLdError
    from json_ld_spark.core.rdf import isomorphic

    def opts(case, ordered=False):
        kw = {}
        if case["base"]:
            kw["base"] = case["base"]
        if case["processing_mode"]:
            kw["processing_mode"] = case["processing_mode"]
        if (case.get("ruby_opts") or {}).get("rdfstar"):
            kw["rdfstar"] = True
        if ordered:
            kw["ordered"] = True
        return kw

    def sweep(spec, runner, ordered=False):
        p = f = s = 0
        failures = []
        for c0 in harvest(spec):
            if c0["unsupported"]:
                s += 1
                continue
            case = parse_json_fields(c0)
            if case is None:
                s += 1
                continue
            try:
                ok = runner(case, opts(case, ordered))
                if ok is None:
                    s += 1
                elif ok:
                    p += 1
                else:
                    f += 1
                    failures.append(case["title"])
            except JsonLdError:
                if case["exception"]:
                    p += 1
                else:
                    f += 1
                    failures.append(case["title"])
            except Exception as e:
                f += 1
                failures.append(f"{case['title']} (CRASH {type(e).__name__})")
        return p, f, s, failures

    def r_expand(case, kw):
        got = api.expand(case["input"], **kw)
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    def r_compact(case, kw):
        if case["context"] is None:
            return None
        got = api.compact(case["input"], case["context"], **kw)
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    def r_flatten(case, kw):
        got = api.flatten(case["input"], case["context"], **kw)
        if case["exception"] and case["output"] is None:
            return False
        if case["output"] is None:
            return None
        return norm(got) == norm(case["output"])

    def r_frame(case, kw):
        if case["frame"] is None or case["output"] is None:
            return None
        fkw = dict(case.get("ruby_opts") or {})
        fkw.pop("rdfstar", None)
        kw = {**kw, **fkw}
        kw.setdefault("processing_mode", "json-ld-1.0")
        got = api.frame(case["input"], case["frame"], **kw)
        return norm(got) == norm(case["output"])

    rows = []
    for name, spec, runner, modes in [
        ("expand", "expand_spec.rb", r_expand, ("unordered", "ordered")),
        ("compact", "compact_spec.rb", r_compact, ("unordered", "ordered")),
        ("flatten", "flatten_spec.rb", r_flatten, ("unordered",)),
        ("frame", "frame_spec.rb", r_frame, ("unordered",)),
    ]:
        for mode in modes:
            p, f, s, failures = sweep(spec, runner, ordered=(mode == "ordered"))
            rows.append((name, mode, p, f, s, failures))

    # toRDF via turtle goldens
    import json as _json

    p = f = s = 0
    failures = []
    for case in harvest_to_rdf():
        if case["unsupported"]:
            s += 1
            continue
        try:
            doc = _json.loads(case["input"])
        except ValueError:
            s += 1
            continue
        want = parse_turtle(
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . " + case["ttl"]
        )
        try:
            got = api.to_rdf(doc, **case["opts"])
            if isomorphic(got, want):
                p += 1
            else:
                f += 1
                failures.append(case["title"])
        except Exception as e:
            f += 1
            failures.append(f"{case['title']} ({type(e).__name__})")
    rows.append(("toRDF", "isomorphism", p, f, s, failures))

    p = f = 0
    failures = []
    for case in harvest_from_rdf():
        try:
            got = api.from_rdf(
                parse_turtle(case["ttl"]), ordered=True, **case["opts"]
            )
            if norm(got) == norm(case["output"]):
                p += 1
            else:
                f += 1
                failures.append(case["title"])
        except Exception as e:
            f += 1
            failures.append(f"{case['title']} ({type(e).__name__})")
    rows.append(("fromRDF", "unordered", p, f, 0, failures))

    lines = [
        "# CONFORMANCE — live sweep vs the reference's own spec tables",
        "",
        "Generated by `python scripts/conformance_report.py` (the EARL-report",
        "analog of the reference's `etc/earl.jsonld`). Cases are harvested at",
        "run time from `/root/reference/spec/*_spec.rb`; toRDF compares under",
        "the same bnode-renaming-invariant graph isomorphism the reference's",
        "harness uses (`spec/suite_helper.rb:268-274`).",
        "",
        "| operation | mode | pass | fail | skipped* | rate |",
        "|---|---|---|---|---|---|",
    ]
    total_p = total_f = 0
    for name, mode, p, f, s, failures in rows:
        total_p += p
        total_f += f
        rate = f"{p / (p + f):.1%}" if (p + f) else "—"
        lines.append(f"| {name} | {mode} | {p} | {f} | {s} | {rate} |")
    lines += [
        "",
        f"**Total: {total_p} pass / {total_f} fail "
        f"({total_p / (total_p + total_f):.1%})**",
        "",
        "\\* skipped = cases carrying options outside this engine's surface",
        "(remote loaders, `validate:`-with-warning cases, Ruby-interpolated",
        "fixtures) or fields the harvester cannot mechanically extract.",
    ]
    fails_all = [x for _, _, _, _, _, fs in rows for x in fs]
    if fails_all:
        lines += ["", "## Failures", ""]
        lines += [f"- {x}" for x in fails_all]
    out = os.path.join(REPO, "CONFORMANCE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {total_p} pass / {total_f} fail")


if __name__ == "__main__":
    main()
