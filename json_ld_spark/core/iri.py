"""RFC 3986 reference resolution (strict), used for document-relative
IRI expansion and `@base` handling.

Implemented directly from RFC 3986 §5.2 rather than urllib.urljoin
(urljoin special-cases known schemes and mishandles e.g. ``urn:``/
``tag:`` bases that the JSON-LD suites exercise).

Parity: the reference delegates to RDF::URI#join (context.rb:1365-1375)
which is also a strict RFC 3986 implementation.
"""

from __future__ import annotations

import re

_URI_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?"  # scheme
    r"(?://([^/?#]*))?"  # authority
    r"([^?#]*)"  # path
    r"(?:\?([^#]*))?"  # query
    r"(?:#(.*))?$",  # fragment
    re.S,
)


def parse_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    m = _URI_RE.match(iri)
    assert m is not None  # the regex matches any string
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            # move first path segment (incl. leading /) to output
            i = path.find("/", 1)
            if i == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


def _recompose(
    scheme: str | None,
    authority: str | None,
    path: str,
    query: str | None,
    fragment: str | None,
) -> str:
    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if authority is not None:
        out.append("//" + authority)
    out.append(path)
    if query is not None:
        out.append("?" + query)
    if fragment is not None:
        out.append("#" + fragment)
    return "".join(out)


def resolve_iri(base: str | None, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2.2."""
    if base is None:
        return ref
    r_scheme, r_auth, r_path, r_query, r_frag = parse_iri(ref)
    if r_scheme is not None:
        return _recompose(
            r_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag
        )
    b_scheme, b_auth, b_path, b_query, _ = parse_iri(base)
    if r_auth is not None:
        t_auth, t_path, t_query = r_auth, remove_dot_segments(r_path), r_query
    elif not r_path:
        t_auth, t_path = b_auth, b_path
        t_query = r_query if r_query is not None else b_query
    else:
        t_auth = b_auth
        if r_path.startswith("/"):
            t_path = remove_dot_segments(r_path)
        else:
            if b_auth is not None and not b_path:
                merged = "/" + r_path
            else:
                merged = b_path[: b_path.rfind("/") + 1] + r_path
            t_path = remove_dot_segments(merged)
        t_query = r_query
    return _recompose(b_scheme, t_auth, t_path, t_query, r_frag)


def make_relative(base: str | None, iri: str) -> str:
    """Inverse of resolve: shorten ``iri`` relative to ``base`` when
    possible (compaction output). Parity: Context#remove_base,
    context.rb:1978-1997.
    """
    if not base:
        return iri
    b_scheme, b_auth, b_path, b_query, _ = parse_iri(base)
    i_scheme, i_auth, i_path, i_query, i_frag = parse_iri(iri)
    if b_scheme != i_scheme or b_auth != i_auth:
        return iri
    if b_path == i_path and b_query == i_query:
        if i_frag is not None:
            return "#" + i_frag
        return iri[len(_recompose(b_scheme, b_auth, "", None, None)) :] or iri
    base_segs = b_path.split("/")
    iri_segs = i_path.split("/")
    base_dir = base_segs[:-1]
    # count shared leading directory segments
    shared = 0
    while (
        shared < len(base_dir)
        and shared < len(iri_segs) - 1
        and base_dir[shared] == iri_segs[shared]
    ):
        shared += 1
    ups = len(base_dir) - shared
    rel = "../" * ups + "/".join(iri_segs[shared:])
    if not rel:
        rel = "./"
    out = rel
    if i_query is not None:
        out += "?" + i_query
    if i_frag is not None:
        out += "#" + i_frag
    return out if len(out) < len(iri) else iri
