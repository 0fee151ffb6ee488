"""Template expansion for ``@{...}`` references.

Reproduces the reference's template language byte-for-byte
(reference: kg_text_to_ttl/text_to_turtle_processor.py:2599-2669):

- ``@{name.group:func}`` — group of a *named* match, optionally transformed.
- ``@{name}`` / ``@{1}``  — a variable reference (the reference wraps the
  variable lookup in ``str(...)`` so an undefined variable expands to the
  string ``"None"``; we reproduce that quirk because emitted triples depend
  on it).
- ``@{?...}`` — optional: a missing *match* expands to ``""`` instead of
  raising.
- Nesting: inner references are expanded first because the scanner re-runs
  until no reference remains and the regex does not match unexpanded inner
  ``@{``.
- Transformation functions: ``trim`` (strip), ``iri`` (strip + non
  ``[a-zA-Z0-9_-]`` → ``_`` — this mints URI fragments and must be exact),
  ``norm`` (strip + ``[\\n\\t\\r]+`` → space + html.unescape).
"""

from __future__ import annotations

import html
import re
from typing import Any, Mapping

__all__ = ["expand_template", "TemplateError", "iri_slug", "norm_text"]

_RE_REF = re.compile(
    r"@\{\??(([a-zA-Z0-9_-]+)\.)?((\d+)|([a-zA-Z][a-zA-Z0-9_-]*))(\:[a-zA-Z]+)?\}"
)

_RE_IRI_BAD = re.compile(r"[^a-zA-Z0-9_-]")
_RE_WS = re.compile(r"[\n\t\r]+")


class TemplateError(Exception):
    """Raised when a template cannot be expanded."""


def iri_slug(text: str) -> str:
    """URI-safe slug: strip, then replace every non-word char with ``_``."""
    return _RE_IRI_BAD.sub("_", text.strip())


def norm_text(text: str) -> str:
    """Whitespace-normalize: strip, collapse ``\\n\\t\\r`` runs, unescape HTML."""
    return html.unescape(_RE_WS.sub(" ", text.strip()))


def _apply_func(func_id: str, ext: str) -> str:
    if func_id == "iri":
        return iri_slug(ext)
    if func_id == "trim":
        return ext.strip()
    if func_id == "norm":
        return norm_text(ext)
    # Unknown function names are silently ignored by the reference.
    return ext


def expand_template(
    template: Any,
    variables: Mapping[str, Any],
    matches: Mapping[str, "re.Match[str]"],
    latest_match: "re.Match[str] | None" = None,
) -> Any:
    """Expand all ``@{...}`` references in ``template``.

    Non-string inputs are returned unchanged (the reference calls expansion
    on values that may be ints/None after YAML parsing).
    """
    if not isinstance(template, str):
        return template
    if "@{" not in template:
        return template  # fast path: no references (most constant IRIs)
    original = template
    try:
        pos = 0
        while True:
            # Restart the scan at the last substitution point when the
            # prefix provably contains no "@{" (keeps multi-ref templates
            # linear); nested refs like @{a-@{b}} complete an OUTER ref
            # left of the substitution, so any "@{" in the prefix forces a
            # rescan from 0.
            m = _RE_REF.search(template, pos)
            if m is None:
                break
            optional = m.group(0).startswith("@{?")
            match_id = m.group(2)
            if m.group(4):
                group_ref: int | str = int(m.group(4))
            else:
                group_ref = m.group(5)
            try:
                if match_id:
                    named = matches.get(match_id)
                    if named is not None:
                        ext = named.group(group_ref)
                    else:
                        if not optional:
                            raise TemplateError(
                                f"No match with id {match_id} found when looking at "
                                f"template {template}"
                            )
                        ext = ""
                else:
                    # Variable reference. The reference stringifies the lookup
                    # result, so a missing variable becomes the string "None"
                    # (its latest-match fallback is therefore unreachable);
                    # reproduced deliberately for triple parity.
                    ext = str(variables.get(group_ref))
            except IndexError as ex:
                raise TemplateError(
                    f"Template expansion: no such group or variable {m.group(0)}"
                ) from ex
            func_id = m.group(6)
            if func_id is not None:
                ext = _apply_func(func_id[1:], ext)
            start = m.start(0)
            template = template[:start] + (ext or "") + template[m.end(0):]
            # restart ONE char left of the substitution: a '@' at start-1
            # can combine with a substituted value beginning '{...}' into a
            # new reference (e.g. "@@{v}" with v="{x}" → "@{x}")
            pos = max(start - 1, 0) if "@{" not in template[:start] else 0
    except TemplateError:
        raise
    except Exception as ex:  # pragma: no cover - defensive parity
        raise TemplateError(f"Failed to expand template: {original}") from ex
    return template
