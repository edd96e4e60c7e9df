"""XSLT-1.0 subset interpreter for the documented transform shape (F3).

The reference's configurable data transformation
(docs/Runbook.DataSpecifications.md:55-93) supports XSLT 1.0/2.0, but its
documented use is narrow: an identity template plus match templates that
rewrite an attribute or element on the way through (the published sample
rewrites ``Item/@bankKey`` from 10200 to 200). This module executes exactly
that shape on the stdlib ``xml.etree`` — no lxml needed — and raises
``NotImplementedError`` for anything outside the subset, so callers can
fall back to real lxml-XSLT where it is installed (``pipeline.py`` prefers
lxml and uses this as the fallback).

Supported:
- the identity template ``match="@*|node()"`` with ``xsl:copy`` +
  ``xsl:apply-templates`` (recognized structurally; the engine copies by
  default);
- ``<xsl:template match="Elem">``, ``Parent/Elem``, ``Elem/@attr`` —
  optionally with a value predicate ``[.='v']`` / ``['v']`` (the doc
  sample's shorthand) on the final step;
- template bodies made of: literal text, ``<xsl:value-of select="'lit'"/>``
  or ``select="."``, ``<xsl:attribute name="n">…</xsl:attribute>``, and an
  EMPTY body (which deletes the matched node).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

_XSL_NS = "http://www.w3.org/1999/XSL/Transform"


def _xsl(tag: str) -> str:
    return f"{{{_XSL_NS}}}{tag}"


@dataclass(frozen=True)
class _Match:
    elem_path: tuple[str, ...]  # element name path, innermost last
    attr: str | None            # attribute name when matching Elem/@attr
    value: str | None           # required current value (predicate), or None


@dataclass(frozen=True)
class _Template:
    match: _Match
    body: tuple  # parsed body ops: ("set_attr", name, value) | ("text", v) | ("delete",)


_PRED_RE = re.compile(r"^(?P<name>[^\[\]]+)(?:\[(?P<pred>[^\]]*)\])?$")


def _parse_predicate(pred: str | None) -> str | None:
    if pred is None:
        return None
    pred = pred.strip()
    m = re.fullmatch(r"\.\s*=\s*'([^']*)'", pred) or re.fullmatch(r"'([^']*)'", pred)
    if not m:
        raise NotImplementedError(f"unsupported XSLT predicate: [{pred}]")
    return m.group(1)


def _parse_match(expr: str) -> _Match | None:
    """None → the identity template."""
    expr = expr.strip()
    if expr in ("@*|node()", "node()|@*"):
        return None
    steps = [s for s in expr.split("/") if s]
    attr = value = None
    if steps and steps[-1].startswith("@"):
        m = _PRED_RE.fullmatch(steps.pop()[1:])
        if not m:
            raise NotImplementedError(f"unsupported XSLT match: {expr}")
        attr, value = m.group("name"), _parse_predicate(m.group("pred"))
    elems = []
    for s in steps:
        m = _PRED_RE.fullmatch(s)
        if not m or m.group("name").startswith("@"):
            raise NotImplementedError(f"unsupported XSLT match: {expr}")
        if m.group("pred") is not None:
            if attr is not None or s is not steps[-1]:
                raise NotImplementedError(f"unsupported XSLT match: {expr}")
            value = _parse_predicate(m.group("pred"))
        elems.append(m.group("name"))
    if not elems and attr is None:
        raise NotImplementedError(f"unsupported XSLT match: {expr}")
    return _Match(elem_path=tuple(elems), attr=attr, value=value)


def _value_of(el: ET.Element, context_text: str) -> str:
    sel = (el.get("select") or "").strip()
    m = re.fullmatch(r"'([^']*)'", sel)
    if m:
        return m.group(1)
    if sel == ".":
        return context_text
    raise NotImplementedError(f"unsupported xsl:value-of select: {sel}")


def _parse_body(tmpl: ET.Element) -> tuple:
    """Body ops relative to the matched node.

    ``xsl:copy`` / ``xsl:apply-templates`` are the identity machinery (the
    engine copies by default) — a body containing them is NOT a delete,
    and ops nested inside ``xsl:copy`` are collected recursively. Only a
    genuinely empty body (no children, no text) deletes the matched node.
    """
    ops: list[tuple] = []
    saw_identity = False

    def visit(node: ET.Element) -> None:
        nonlocal saw_identity
        for child in node:
            if child.tag == _xsl("attribute"):
                name = child.get("name")
                val = (child.text or "").strip()
                for sub in child:
                    if sub.tag == _xsl("value-of"):
                        val += _value_of(sub, "")
                    else:
                        raise NotImplementedError(
                            f"unsupported node in xsl:attribute: {sub.tag}")
                ops.append(("set_attr", name, val))
            elif child.tag == _xsl("value-of"):
                ops.append(("text", _value_of(child, "")))
            elif child.tag == _xsl("copy"):
                saw_identity = True
                visit(child)  # rewrites nested inside the copy still apply
            elif child.tag == _xsl("apply-templates"):
                saw_identity = True
            else:
                raise NotImplementedError(
                    f"unsupported template body node: {child.tag}")

    if tmpl.text and tmpl.text.strip():
        ops.append(("text", tmpl.text.strip()))
    visit(tmpl)
    if ops:
        return tuple(ops)
    if saw_identity:
        return ()  # explicit keep-as-is override — no-op, not a delete
    return (("delete",),)


def parse_stylesheet(xslt: str) -> list[_Template]:
    root = ET.fromstring(xslt)
    if root.tag not in (_xsl("stylesheet"), _xsl("transform")):
        raise NotImplementedError("not an xsl:stylesheet document")
    out: list[_Template] = []
    has_identity = False
    for tmpl in root:
        if tmpl.tag == _xsl("output"):
            continue
        if tmpl.tag != _xsl("template"):
            raise NotImplementedError(f"unsupported top-level node: {tmpl.tag}")
        match = _parse_match(tmpl.get("match", ""))
        if match is None:
            has_identity = True
            continue
        out.append(_Template(match=match, body=_parse_body(tmpl)))
    if not has_identity:
        raise NotImplementedError(
            "xslt_lite requires the identity template (match=\"@*|node()\") — "
            "whole-document rewrites are outside the supported subset"
        )
    return out


def _path_matches(path: tuple[str, ...], stack: tuple[str, ...]) -> bool:
    # match pattern is relative: the stack's tail must equal the path
    return len(stack) >= len(path) and stack[-len(path):] == path


def transform(xslt: str, doc: str) -> str:
    """Apply the stylesheet to the document, identity-by-default."""
    templates = parse_stylesheet(xslt)
    root = ET.fromstring(doc)

    def walk(el: ET.Element, stack: tuple[str, ...]) -> bool:
        """Returns False if the element should be deleted from its parent."""
        here = stack + (el.tag,)
        for t in templates:
            m = t.match
            if m.attr is not None:
                if not _path_matches(m.elem_path, here):
                    continue
                cur = el.get(m.attr)
                if cur is None or (m.value is not None and cur != m.value):
                    continue
                for op in t.body:
                    if op[0] == "set_attr":
                        el.set(op[1], op[2])
                    elif op[0] == "delete":
                        del el.attrib[m.attr]
                    else:
                        raise NotImplementedError(
                            "attribute template bodies may only set attributes")
            else:
                if not _path_matches(m.elem_path, here):
                    continue
                if m.value is not None and (el.text or "").strip() != m.value:
                    continue
                for op in t.body:
                    if op[0] == "text":
                        el.text = op[1]
                    elif op[0] == "set_attr":
                        el.set(op[1], op[2])
                    elif op[0] == "delete":
                        return False
        for child in list(el):
            if not walk(child, here):
                el.remove(child)
        return True

    if not walk(root, ()):
        return ""
    return ET.tostring(root, encoding="unicode")
