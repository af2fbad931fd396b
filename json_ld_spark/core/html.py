"""HTML script extraction: ``<script type="application/ld+json">`` →
JSON-LD documents.

Parity: API.load_html + SCRIPT_LOADERS
(/root/reference/lib/json/ld/api.rb:766-887):
  - fragment URLs select the script with that id
  - extractAllScripts concatenates every ld+json script (dicts append,
    arrays extend)
  - otherwise the FIRST ld+json script wins
  - <base href> in <head> yields the document base
  - missing script → "loading document failed"; bad JSON →
    "invalid script element"

stdlib html.parser only — no external HTML library (the reference
falls back from nokogiri to rexml the same way, api.rb:799-805).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Any, Optional
from urllib.parse import unquote, urljoin

from json_ld_spark.core import errors as err
from json_ld_spark.core.errors import JsonLdError

JSONLD_TYPE = "application/ld+json"


class _ScriptCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.scripts: list[dict] = []  # {type, id, content}
        self.base_href: Optional[str] = None
        self._current: Optional[dict] = None

    def handle_starttag(self, tag: str, attrs) -> None:
        attrd = dict(attrs)
        if tag == "script":
            self._current = {
                "type": (attrd.get("type") or "").strip(),
                "id": attrd.get("id"),
                "content": "",
            }
        elif tag == "base" and self.base_href is None:
            self.base_href = attrd.get("href")

    def handle_endtag(self, tag: str) -> None:
        if tag == "script" and self._current is not None:
            self.scripts.append(self._current)
            self._current = None

    def handle_data(self, data: str) -> None:
        if self._current is not None:
            self._current["content"] += data

    def handle_comment(self, data: str) -> None:
        # scripts may comment-wrap their payload ("uncomments input")
        if self._current is not None:
            self._current["content"] += data


def _load_script(content: str) -> Any:
    # "uncomments input" (api.rb:786): scripts may wrap their payload
    # in an HTML comment; inside <script> the parser sees it as CDATA
    stripped = content.strip()
    if stripped.startswith("<!--") and stripped.endswith("-->"):
        content = stripped[4:-3]
    try:
        return json.loads(content)
    except ValueError as e:
        raise JsonLdError(err.INVALID_SCRIPT_ELEMENT, str(e))


def extract_jsonld(
    html_text: str,
    url: Optional[str] = None,
    extract_all_scripts: bool = False,
) -> tuple[Any, Optional[str]]:
    """Return (document, base) extracted from HTML.

    ``url`` with a fragment selects ``<script id=fragment>``; the
    returned base is <base href> joined against ``url`` when present.
    """
    parser = _ScriptCollector()
    parser.feed(html_text)
    base = None
    if parser.base_href is not None:
        base = urljoin(url, parser.base_href) if url else parser.base_href

    fragment = None
    if url and "#" in url:
        fragment = unquote(url.split("#", 1)[1])

    if fragment:
        for s in parser.scripts:
            if s["id"] == fragment:
                if not s["type"].startswith(JSONLD_TYPE):
                    raise JsonLdError(
                        err.LOADING_DOCUMENT_FAILED,
                        f"script tag has type={s['type']!r}",
                    )
                return _load_script(s["content"]), base
        raise JsonLdError(
            err.LOADING_DOCUMENT_FAILED, f"no script tag found with id={fragment}"
        )

    ld_scripts = [s for s in parser.scripts if s["type"].startswith(JSONLD_TYPE)]
    if extract_all_scripts:
        res: list = []
        for s in ld_scripts:
            r = _load_script(s["content"])
            if isinstance(r, list):
                res.extend(r)
            else:
                res.append(r)
        return res, base
    if not ld_scripts:
        raise JsonLdError(err.LOADING_DOCUMENT_FAILED, "no script tag found")
    return _load_script(ld_scripts[0]["content"]), base


def detect_jsonld(sample: str) -> bool:
    """Format sniffing: does a text sample look like JSON-LD?

    Parity: Format.detect (format.rb:43-47): a `{"@id|@context|@type"`
    pattern, excluding CSVW metadata documents."""
    import re as _re

    return bool(
        _re.search(r'\{\s*"@(id|context|type)"', sample, _re.S)
    ) and "http://www.w3.org/ns/csvw" not in sample
