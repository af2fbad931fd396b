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


def _case_block(src: str, start: int) -> int:
    """start indexes the '{' of a `'title' => {` case hash; returns the
    index past its balanced close, skipping %( ... ) literal spans so
    braces inside embedded JSON don't confuse the count."""
    depth = 0
    i = start
    while i < len(src):
        c = src[i]
        if c == "%" and i + 1 < len(src) and src[i + 1] == "(":
            _, i = _extract_pct_paren(src, i + 1)
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return len(src)


def harvest(spec_file: str) -> list[dict]:
    """Return a list of case dicts: {title, input, output, context,
    frame, exception, base, processing_mode, unsupported}. Cases are
    `'title' => { ...fields... }` hashes with %() JSON literals; field
    order varies by suite (frame_spec puts frame: first), so each case
    is bounded by balanced braces, not by the next input:."""
    src = open(f"{SPEC}/{spec_file}").read()
    runners = [
        (m.start(), m.group(0))
        for m in re.finditer(r"it\((?:title|name)\)\s*\{[^\n]*", src)
    ]
    cases: list[dict] = []
    # case keys appear as `'title' => {` (hash-rocket), `'title': {`
    # (quoted symbol), bare symbols (`base: {`), or literals
    # (`true => {`) depending on the spec file
    for m in re.finditer(
        r"(?:['\"]([^'\"\n]{1,160})['\"](?:\s*=>\s*|:\s*)"
        r"|(\w[\w .-]{0,60}?):\s*"
        r"|(true|false)\s*=>\s*)\{",
        src,
    ):
        block_end = _case_block(src, m.end() - 1)
        block = src[m.end() : block_end]
        if not re.search(r"input:\s*%\(", block):
            continue  # not a test-case hash (e.g. nested JSON object)
        case: dict = {
            "title": m.group(1) or m.group(2) or m.group(3),
            "input": None,
            "output": None,
            "context": None,
            "frame": None,
            "exception": None,
            "base": None,
            "processing_mode": None,
            "unsupported": False,
        }
        for field in ("input", "output", "context", "frame"):
            fm = re.search(rf"{field}:\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _extract_pct_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        if case["input"] is None:
            continue
        em = re.search(r"exception:\s*JSON::LD::JsonLdError::(\w+)", block)
        if em:
            case["exception"] = em.group(1)
        bm = re.search(r"base:\s*[\"']([^\"']+)[\"']", block)
        if bm:
            case["base"] = bm.group(1)
        pm = re.search(r"processingMode:\s*[\"']([^\"']+)[\"']", block)
        if pm:
            case["processing_mode"] = pm.group(1)
        # strip the embedded %() spans, then scan remaining Ruby keys
        # for options we model (booleans) or don't (→ unsupported)
        ruby_only = re.sub(r"%\((?:[^()]|\([^()]*\))*\)", "", block)
        case["ruby_opts"] = {}
        for opt, name in (("pruneBlankNodeIdentifiers",
                           "prune_blank_node_identifiers"),
                          ("omitGraph", "omit_graph"),
                          ("requireAll", "require_all"),
                          ("explicit", "explicit"),
                          ("omitDefault", "omit_default")):
            om = re.search(rf"^\s*{opt}:\s*(true|false)", ruby_only, re.M)
            if om:
                case["ruby_opts"][name] = om.group(1) == "true"
        em2 = re.search(r"^\s*embed:\s*['\"]([^'\"]+)['\"]", ruby_only, re.M)
        if em2:
            case["ruby_opts"]["embed"] = em2.group(1)
        if _UNSUPPORTED_CASE_OPTS.search(ruby_only):
            case["unsupported"] = True
        if re.search(r"rdfstar:\s*true", ruby_only):
            case["ruby_opts"]["rdfstar"] = True
        # group runner applying to this case: first it(title) AFTER it
        for pos, line in runners:
            if pos > block_end:
                gb = re.search(r"base:\s*[\"']([^\"']+)[\"']", line)
                if gb and case["base"] is None:
                    case["base"] = gb.group(1)
                gp = re.search(r"processingMode:\s*[\"']([^\"']+)[\"']", line)
                if gp and case["processing_mode"] is None:
                    case["processing_mode"] = gp.group(1)
                if re.search(r"validate|write:|library|StringIO", line):
                    case["unsupported"] = True
                if "rdfstar" in line:
                    case["ruby_opts"]["rdfstar"] = True
                for opt, name in (
                    ("pruneBlankNodeIdentifiers", "prune_blank_node_identifiers"),
                    ("omitGraph", "omit_graph"),
                ):
                    om = re.search(rf"{opt}:\s*(true|false)", line)
                    if om and name not in case["ruby_opts"]:
                        case["ruby_opts"][name] = om.group(1) == "true"
                break
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


# ---------------------------------------------------------------------------
# Turtle subset parser (test-side only): enough for the reference's
# to_rdf_spec.rb tables — @prefix, IRIs, prefixed names, `a`, _:bnodes,
# [ ... ] anonymous nodes, ( ... ) collections, `;` `,` shorthand,
# typed/language literals, numeric/boolean shorthand.
# ---------------------------------------------------------------------------

from json_ld_spark.core.rdf import (  # noqa: E402
    Term,
    Triple,
    bnode as _bnode,
    iri as _iri,
)

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XSD = "http://www.w3.org/2001/XMLSchema#"

_TTL_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iriref><[^>]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtmark>\^\^)
  | (?P<bnode>_:[A-Za-z0-9]+)
  | (?P<pname>[A-Za-z][\w.-]*)?:(?P<plocal>[\w.-]*)
  | (?P<num>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<kw>a\b|true\b|false\b|@prefix)
  | (?P<punct>[\[\]();,.])
    """,
    re.X,
)


def _ttl_tokens(text: str) -> list[tuple[str, str]]:
    out = []
    i = 0
    while i < len(text):
        m = _TTL_TOKEN.match(text, i)
        if not m:
            raise ValueError(f"turtle tokenize error at {text[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws",):
            continue
        if kind == "plocal":  # pname match sets plocal as lastgroup
            out.append(("pname", (m.group("pname") or "") + ":" + m.group("plocal")))
        else:
            out.append((kind, m.group(0)))
    return out


class _TtlParser:
    def __init__(self, text: str):
        self.toks = _ttl_tokens(text)
        self.i = 0
        self.prefixes = {"xsd": _XSD, "rdf": _RDF}
        self.triples: list[Triple] = []
        self.n_bn = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def fresh_bnode(self) -> Term:
        self.n_bn += 1
        return _bnode(f"_:anon{self.n_bn}")

    def parse(self) -> list[Triple]:
        while self.peek()[0] is not None:
            k, v = self.peek()
            if v == "@prefix":
                self.next()
                _, pname = self.next()
                _, iriref = self.next()
                self.prefixes[pname.rstrip(":").split(":")[0]] = iriref[1:-1]
                self.expect(".")
            else:
                subj = self.parse_node()
                if self.peek()[1] != ".":
                    self.parse_po_list(subj)
                self.expect(".")
        return self.triples

    def resolve(self, pname: str) -> str:
        pref, _, local = pname.partition(":")
        if pref not in self.prefixes:
            raise ValueError(f"unknown prefix {pref!r}")
        return self.prefixes[pref] + local

    def parse_node(self) -> Term:
        k, v = self.next()
        if k == "iriref":
            return _iri(v[1:-1])
        if k == "bnode":
            return _bnode(v)
        if k == "pname":
            return _iri(self.resolve(v))
        if v == "[":
            node = self.fresh_bnode()
            if self.peek()[1] != "]":
                self.parse_po_list(node)
            self.expect("]")
            return node
        if v == "(":
            items = []
            while self.peek()[1] != ")":
                items.append(self.parse_object())
            self.expect(")")
            if not items:
                return _iri(_RDF + "nil")
            nodes = [self.fresh_bnode() for _ in items]
            for idx, item in enumerate(items):
                self.triples.append(Triple(nodes[idx], _iri(_RDF + "first"), item, None))
                rest = nodes[idx + 1] if idx + 1 < len(nodes) else _iri(_RDF + "nil")
                self.triples.append(Triple(nodes[idx], _iri(_RDF + "rest"), rest, None))
            return nodes[0]
        raise ValueError(f"unexpected subject token {v!r}")

    def parse_po_list(self, subj: Term) -> None:
        while True:
            k, v = self.next()
            if v == "a":
                pred = _iri(_RDF + "type")
            elif k == "iriref":
                pred = _iri(v[1:-1])
            elif k == "pname":
                pred = _iri(self.resolve(v))
            elif k == "bnode":
                pred = _bnode(v)
            else:
                raise ValueError(f"unexpected predicate token {v!r}")
            while True:
                obj = self.parse_object()
                self.triples.append(Triple(subj, pred, obj, None))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                if self.peek()[1] in (".", "]", None):
                    return  # trailing semicolon
                continue
            return

    def parse_object(self) -> Term:
        k, v = self.peek()
        if k == "string":
            self.next()
            raw = json.loads(v.replace("\\'", "'"))  # turtle escapes ≈ JSON
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                return Term("literal", raw,
                            _RDF + "langString", nv[1:].lower())
            if nk == "dtmark":
                self.next()
                dk, dv = self.next()
                dt = dv[1:-1] if dk == "iriref" else self.resolve(dv)
                return Term("literal", raw, dt, None)
            return Term("literal", raw, _XSD + "string", None)
        if k == "num":
            self.next()
            if "." in v or "e" in v.lower():
                dt = _XSD + ("double" if "e" in v.lower() else "decimal")
            else:
                dt = _XSD + "integer"
            return Term("literal", v, dt, None)
        if v in ("true", "false"):
            self.next()
            return Term("literal", v, _XSD + "boolean", None)
        return self.parse_node()


def parse_turtle(text: str) -> list[Triple]:
    return _TtlParser(text).parse()


_PAIR_RE = re.compile(
    r"""['"]([^'"\n]{1,160})['"]\s*=>\s*\[\s*
        '((?:[^'\\]|\\.)*)'\s*,\s*
        '((?:[^'\\]|\\.)*)'\s*\]""",
    re.X | re.S,
)


def harvest_to_rdf(spec_file: str = "to_rdf_spec.rb") -> list[dict]:
    """JSON→Turtle pairs from to_rdf_spec.rb tables, with per-table
    options scraped from the following `it title do ... parse(js, ...)`
    block."""
    src = open(f"{SPEC}/{spec_file}").read()
    its = [
        (m.start(), src[m.start() : m.start() + 400])
        for m in re.finditer(r"it title do", src)
    ]
    cases = []
    for m in _PAIR_RE.finditer(src):
        title, js, ttl = m.group(1), m.group(2), m.group(3)
        js = js.replace("\\'", "'")
        ttl = ttl.replace("\\'", "'")
        opts: dict = {}
        unsupported = False
        for pos, block in its:
            if pos > m.end():
                if "rdfstar" in block or "validate: false" in block:
                    unsupported = True
                rd = re.search(r"rdfDirection:\s*'([^']+)'", block)
                if rd:
                    opts["rdf_direction"] = rd.group(1)
                bm = re.search(r"base:\s*['\"]([^'\"]+)['\"]", block)
                if bm:
                    opts["base"] = bm.group(1)
                if "produceGeneralizedRdf" in block:
                    opts["produce_generalized_rdf"] = True
                break
        cases.append(
            {"title": title, "input": js, "ttl": ttl, "opts": opts,
             "unsupported": unsupported}
        )
    return cases


def harvest_from_rdf(spec_file: str = "from_rdf_spec.rb") -> list[dict]:
    """Turtle-input → expanded-JSON-output cases from from_rdf_spec.rb
    (expected values are Ruby hash literals mechanically converted to
    JSON; non-convertible cases are skipped)."""
    src = open(f"{SPEC}/{spec_file}").read()
    cases = []
    for ch in re.split(r'\n\s*it "', src)[1:]:
        title = ch.split('"', 1)[0]
        im = re.search(r"input\s*=\s*%\(", ch)
        pm = re.search(r"produce_jsonld\(\s*(\[.*?\])\s*,\s*logger\)", ch, re.S)
        if not im or not pm:
            continue
        start = im.end() - 1
        depth = 0
        i = start
        while i < len(ch):
            if ch[i] == "(":
                depth += 1
            elif ch[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        ttl = ch[im.end() : i]
        j = re.sub(r"=>", ":", pm.group(1))
        j = re.sub(r"\bnil\b", "null", j).replace("'", '"')
        try:
            want = json.loads(j)
        except ValueError:
            continue
        opts: dict = {}
        if "useNativeTypes: true" in ch:
            opts["use_native_types"] = True
        if "useRdfType: true" in ch:
            opts["use_rdf_type"] = True
        if re.search(r"rdfDirection: .i18n-datatype", ch):
            opts["rdf_direction"] = "i18n-datatype"
        cases.append({"title": title, "ttl": ttl, "output": want, "opts": opts})
    return cases
