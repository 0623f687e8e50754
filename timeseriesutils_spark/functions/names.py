"""Feature-name grammar — must reproduce the reference exactly.

Generated names are the reference's de-facto output schema (SURVEY §2 name
grammar; reference featurize.py:223,287,295,165,419-420,553-554).  Where
reference docstrings and code disagree, code wins (SURVEY §2.4.9).
"""

from __future__ import annotations


def lag_name(column: str, k: int) -> str:
    """``{c}_lag{k}`` — reference featurize.py:223."""
    return f"{column}_lag{k}"


def target_name(column: str, horizon: int | None = None) -> str:
    """Wide layout ``{c}_target{h}`` (featurize.py:295); long layout
    ``{c}_target`` plus a separate ``horizon`` column (featurize.py:287)."""
    return f"{column}_target{horizon}" if horizon is not None else f"{column}_target"


def rollmean_name(column: str, window_size: int) -> str:
    """``{c}_rollmean_w{w}`` — featurize.py:165 (docstring :145-146 is wrong)."""
    return f"{column}_rollmean_w{window_size}"


def _align_char(window_align: str) -> str:
    if window_align not in ("centered", "trailing"):
        raise ValueError(
            f"window_align must be 'centered' or 'trailing', got {window_align!r}"
        )
    return window_align[0]


def taylor_name(
    column: str,
    taylor_degree: int,
    coef: int,
    window_size: int,
    window_align: str,
    ew_span: int | None,
) -> str:
    """``{c}_taylor_d{D}_c{d}_w{w}{'c'|'t'}_s{span}`` — featurize.py:419-420,
    511-513 (both docstrings :341-343,:470-474 are wrong; code wins)."""
    a = _align_char(window_align)
    return f"{column}_taylor_d{taylor_degree}_c{coef}_w{window_size}{a}_s{ew_span}"


def domfreq_name(column: str, i: int, window_size: int, window_align: str) -> str:
    """``{c}_domfreq{i}_w{w}{'c'|'t'}`` — featurize.py:553,680-683."""
    return f"{column}_domfreq{i}_w{window_size}{_align_char(window_align)}"


def domfreq_logpow_name(column: str, i: int, window_size: int, window_align: str) -> str:
    """``{c}_domfreq{i}_logpow_w{w}{'c'|'t'}`` — featurize.py:554."""
    return f"{column}_domfreq{i}_logpow_w{window_size}{_align_char(window_align)}"
