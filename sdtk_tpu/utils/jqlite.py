"""First-party jq-subset evaluator.

The reference shells out to the ``jq`` binary for ad-hoc queries
(speaker_detection:705-728, speaker-catalog:655-688); this environment has
no jq, and the framework's design replaces external binaries with
first-party code (like BLAKE3 and the WAV loader).  Supported subset —
enough for the reference's documented query patterns:

    .                       identity
    .field.sub              path access (``?`` suffix tolerated)
    .[]                     array iteration
    .field[]                path then iterate
    a | b                   pipe
    select(EXPR OP LITERAL) filter (==, !=, >, <, >=, <=; and/or)
    length                  array/object/string length
    keys                    sorted object keys
    {out: .path, ...}       object construction
    .[0] / .a[2]            array indexing
    group_by(.path)         sort + group an array by key
    map(EXPR)               apply EXPR per element, collect array

Anything outside this grammar raises JqError with a pointer here —
unsupported syntax fails loudly, never silently returns wrong data.

Multiple outputs stream like jq: iteration produces one result per element.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator


class JqError(ValueError):
    pass


_MISSING = object()


def _get_path(value: Any, path: str) -> Any:
    """Evaluate '.a.b', '.[0].c', '.a[1]' against a value; returns
    _MISSING when absent."""
    if path in (".", ""):
        return value
    cur = value
    # tokenize into field names and [N] indices
    for part in re.findall(r"\[(-?\d+)\]|([A-Za-z_][\w-]*\??)", path):
        idx, field = part
        if idx:
            i = int(idx)
            if isinstance(cur, list) and -len(cur) <= i < len(cur):
                cur = cur[i]
            else:
                return _MISSING
            continue
        field = field.rstrip("?")
        if isinstance(cur, dict) and field in cur:
            cur = cur[field]
        else:
            return _MISSING
    return cur


_LITERAL = re.compile(
    r'^(?:"(?P<str>[^"]*)"|\'(?P<str2>[^\']*)\'|(?P<num>-?\d+(?:\.\d+)?)|'
    r"(?P<bool>true|false)|(?P<null>null))$"
)


def _parse_literal(tok: str) -> Any:
    m = _LITERAL.match(tok.strip())
    if not m:
        raise JqError(f"unsupported literal: {tok!r}")
    if m.group("str") is not None:
        return m.group("str")
    if m.group("str2") is not None:
        return m.group("str2")
    if m.group("num") is not None:
        n = m.group("num")
        return float(n) if "." in n else int(n)
    if m.group("bool") is not None:
        return m.group("bool") == "true"
    return None


_CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: _num(a) >= _num(b),
    "<=": lambda a, b: _num(a) <= _num(b),
    ">": lambda a, b: _num(a) > _num(b),
    "<": lambda a, b: _num(a) < _num(b),
}


def _num(v: Any) -> float:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    raise JqError(f"not a number: {v!r}")


def _eval_condition(cond: str, value: Any) -> bool:
    for joiner, combine in ((" and ", all), (" or ", any)):
        if joiner in cond:
            return combine(
                _eval_condition(c, value) for c in cond.split(joiner)
            )
    for op in ("==", "!=", ">=", "<=", ">", "<"):
        if op in cond:
            lhs, rhs = cond.split(op, 1)
            left = _eval_operand(lhs.strip(), value)
            right = _eval_operand(rhs.strip(), value)
            if left is _MISSING:
                return False
            return _CMP[op](left, right)
    # bare path: truthiness (jq: null/false are falsy)
    v = _eval_operand(cond.strip(), value)
    return v is not _MISSING and v is not None and v is not False


def _eval_operand(tok: str, value: Any) -> Any:
    tok = tok.strip()
    if tok.startswith("."):
        return _get_path(value, tok)
    if tok == "length":
        return len(value) if hasattr(value, "__len__") else _MISSING
    return _parse_literal(tok)


def _split_pipes(expr: str) -> list[str]:
    """Split on '|' outside parens/braces/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in expr:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch in "({[":
            depth += 1
            buf.append(ch)
        elif ch in ")}]":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _apply_stage(stage: str, values: Iterator[Any]) -> Iterator[Any]:
    stage = stage.strip()
    if stage in (".", ""):
        yield from values
        return
    if stage == "length":
        for v in values:
            yield len(v) if hasattr(v, "__len__") else None
        return
    if stage == "keys":
        for v in values:
            if isinstance(v, dict):
                yield sorted(v.keys())
            elif isinstance(v, list):
                yield list(range(len(v)))
            else:
                raise JqError("keys: not an object/array")
        return
    m = re.match(r"^select\((.*)\)$", stage)
    if m:
        cond = m.group(1)
        for v in values:
            if _eval_condition(cond, v):
                yield v
        return
    m = re.match(r"^group_by\((.*)\)$", stage)
    if m:
        keypath = m.group(1).strip()
        for v in values:
            if not isinstance(v, list):
                raise JqError("group_by: input is not an array")
            keyed = []
            for item in v:
                k = _get_path(item, keypath)
                keyed.append((None if k is _MISSING else k, item))
            keyed.sort(key=lambda kv: (kv[0] is not None, str(kv[0])))
            groups: list[list[Any]] = []
            last_key: Any = _MISSING
            for k, item in keyed:
                if groups and k == last_key:
                    groups[-1].append(item)
                else:
                    groups.append([item])
                    last_key = k
            yield groups
        return
    m = re.match(r"^map\((.*)\)$", stage)
    if m:
        inner = m.group(1)
        for v in values:
            if not isinstance(v, list):
                raise JqError("map: input is not an array")
            out: list[Any] = []
            for item in v:
                out.extend(query(inner, item))
            yield out
        return
    m = re.match(r"^\{(.*)\}$", stage)
    if m:
        fields = []
        for part in m.group(1).split(","):
            if ":" in part:
                name, src = part.split(":", 1)
                fields.append((name.strip().strip('"'), src.strip()))
            else:
                name = part.strip().strip('"').lstrip(".")
                fields.append((name, "." + name))
        for v in values:
            out = {}
            for name, src in fields:
                got = _eval_operand(src, v)
                out[name] = None if got is _MISSING else got
            yield out
        return
    if stage.startswith("."):
        # path access with optional [] iterations and [N] indices,
        # e.g. .a.b[].c, .[], .[0].name
        tokens = re.split(r"(\[\])", stage)
        for v in values:
            results = [v]
            for tok in tokens:
                if tok in ("", "."):
                    continue
                if tok == "[]":
                    nxt: list[Any] = []
                    for r in results:
                        if isinstance(r, list):
                            nxt.extend(r)
                        elif isinstance(r, dict):
                            nxt.extend(r.values())
                        elif r is _MISSING or r is None:
                            continue
                        else:
                            raise JqError(f"cannot iterate over {type(r).__name__}")
                    results = nxt
                else:
                    results = [_get_path(r, tok) for r in results]
            for r in results:
                yield None if r is _MISSING else r
        return
    raise JqError(
        f"unsupported expression: {stage!r} (jqlite subset — see "
        "sdtk_tpu/utils/jqlite.py docstring for the supported grammar)"
    )


def query(expr: str, value: Any) -> list[Any]:
    """Evaluate a jq-subset expression; returns the list of outputs."""
    values: Iterator[Any] = iter([value])
    for stage in _split_pipes(expr):
        values = _apply_stage(stage, values)
    return list(values)


def query_lines(expr: str, value: Any) -> str:
    """jq-CLI-style output: one JSON document per line."""
    return "\n".join(
        json.dumps(v, ensure_ascii=False, default=str) for v in query(expr, value)
    )
