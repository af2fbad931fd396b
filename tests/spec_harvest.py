"""Harvest inline test tables from the reference's RSpec files.

The reference's unit specs (spec/expand_spec.rb etc.) embed hundreds of
JSON-LD cases as `input: %({...})` / `output: %([...])` Ruby literals
whose contents are pure JSON. This module extracts them AT TEST TIME
(reading test *data* from the read-only reference checkout, the same
way tests/test_core_golden.py reads spec/test-files) and exposes them
as Python dicts. No reference code is copied.

Limitations (cases are skipped, not failed):
  - group options passed via `params.merge(...)` are captured only for
    `base:`/`rdfstar:`; per-case `language:`/`validate:`/`write:`
    options we don't model mark the case unsupported.
  - rdfstar (JSON-LD-star) cases are out of MVP (SURVEY §2.4).
"""

from __future__ import annotations

import json
import re

SPEC = "/root/reference/spec"

_UNSUPPORTED_CASE_OPTS = re.compile(
    r"^\s*(language|lowercaseLanguage|validate|write|library|remote|"
    r"extractAllScripts|expandContext):", re.M
)


def _extract_pct_paren(src: str, start: int) -> tuple[str, int]:
    """start indexes the '(' of a %(...); returns (content, end)."""
    depth = 0
    i = start
    while i < len(src):
        c = src[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[start + 1 : i], i + 1
        i += 1
    raise ValueError("unbalanced %()")


def harvest(spec_file: str) -> list[dict]:
    """Return a list of case dicts: {title, input, output, context,
    frame, exception, base, processing_mode, unsupported}."""
    src = open(f"{SPEC}/{spec_file}").read()
    marks = list(re.finditer(r"input:\s*%\(", src))
    # each `.each do |title, params|` table ends with ONE runner line,
    # `it(title) { run_xxx ... }` — its options apply to every case in
    # the table, and it is the first such line after the case
    runners = [
        (m.start(), m.group(0))
        for m in re.finditer(r"it\((?:title|name)\)\s*\{[^\n]*", src)
    ]
    cases: list[dict] = []
    for idx, m in enumerate(marks):
        try:
            content, end = _extract_pct_paren(src, m.end() - 1)
        except ValueError:
            continue
        nxt = marks[idx + 1].start() if idx + 1 < len(marks) else len(src)
        block = src[end:nxt]
        titles = re.findall(
            r"['\"]([^'\"\n]{1,160})['\"]\s*=>\s*\{", src[: m.start()]
        )
        case: dict = {
            "title": titles[-1] if titles else f"case{idx}",
            "input": content,
            "output": None,
            "context": None,
            "frame": None,
            "exception": None,
            "base": None,
            "processing_mode": None,
            "unsupported": False,
        }
        for field in ("output", "context", "frame"):
            fm = re.search(rf"{field}:\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _extract_pct_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        em = re.search(r"exception:\s*JSON::LD::JsonLdError::(\w+)", block)
        if em:
            case["exception"] = em.group(1)
        bm = re.search(r"base:\s*[\"']([^\"']+)[\"']", block)
        if bm:
            case["base"] = bm.group(1)
        pm = re.search(r"processingMode:\s*[\"']([^\"']+)[\"']", block)
        if pm:
            case["processing_mode"] = pm.group(1)
        if _UNSUPPORTED_CASE_OPTS.search(block.split("input:")[0] if "input:" in block else block):
            case["unsupported"] = True
        if re.search(r"rdfstar:\s*true", block):
            case["unsupported"] = True
        # group runner applying to this case: first it(title) AFTER it
        for pos, line in runners:
            if pos > m.start():
                gb = re.search(r"base:\s*[\"']([^\"']+)[\"']", line)
                if gb and case["base"] is None:
                    case["base"] = gb.group(1)
                gp = re.search(r"processingMode:\s*[\"']([^\"']+)[\"']", line)
                if gp and case["processing_mode"] is None:
                    case["processing_mode"] = gp.group(1)
                if re.search(r"rdfstar|validate|write:|library|StringIO", line):
                    case["unsupported"] = True
                break
        # per-case unsupported options appear between the case's title
        # brace and its input: — scan the 400 chars before input too
        pre = src[max(0, m.start() - 400) : m.start()]
        last_open = pre.rfind("=> {")
        if last_open >= 0 and _UNSUPPORTED_CASE_OPTS.search(pre[last_open:]):
            case["unsupported"] = True
        cases.append(case)
    return cases


def parse_json_fields(case: dict) -> dict | None:
    """JSON-decode input/output/context/frame; None if not valid JSON
    (Ruby interpolation etc.)."""
    out = dict(case)
    for field in ("input", "output", "context", "frame"):
        if out[field] is not None:
            try:
                out[field] = json.loads(out[field])
            except (json.JSONDecodeError, ValueError):
                return None
    return out


def norm(x):
    """Order-insensitive (multiset) structural normal form for
    comparing expanded/compacted documents (the reference's
    produce_jsonld matcher is order-insensitive for unordered runs)."""
    if isinstance(x, dict):
        return ("D", tuple(sorted((k, norm(v)) for k, v in x.items())))
    if isinstance(x, list):
        return ("L", tuple(sorted(norm(v) for v in x)))
    if isinstance(x, bool):
        return ("b", x)
    if isinstance(x, (int, float)):
        return ("n", float(x))
    return ("s", str(x))
