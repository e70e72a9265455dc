"""PySpark compatibility shims.

PySpark 4.1 cannot collect ``YearMonthIntervalType`` values —
``YearMonthIntervalType.fromInternal`` raises ``[NOT_IMPLEMENTED]``
(the JVM side stores them as a month count; only ``DayTimeIntervalType``
got a Python twin, ``datetime.timedelta``). The dialect emits
``make_ym_interval(...)`` for PG ``make_interval(years => ..,
months => ..)`` (reference surface: pass-through scalar functions,
``app/routes/datasets/queries.py``), so a bare-projected year-month
interval must survive ``.collect()``: patch ``fromInternal`` to wrap
the month count in :class:`YearMonthInterval`, which the download
serializers render in PG's text style ('1 year 2 mons').

The patch is value-adding only — no behavior changes for any other
type, and consumed forms (``ts + make_interval(...)``) never hit it.
"""

from __future__ import annotations

from pyspark.sql.types import YearMonthIntervalType


class YearMonthInterval:
    """A collected PG year-month interval: a signed total month count."""

    __slots__ = ("months",)

    def __init__(self, months: int):
        self.months = int(months)

    def __eq__(self, other):
        if isinstance(other, YearMonthInterval):
            return self.months == other.months
        if isinstance(other, int):
            return self.months == other
        return NotImplemented

    def __hash__(self):
        return hash(("YearMonthInterval", self.months))

    def __repr__(self):
        return f"YearMonthInterval(months={self.months})"

    def pg_text(self) -> str:
        """PG default IntervalStyle: '1 year 2 mons', '-1 years -2 mons',
        '00:00:00' for the zero interval (matches PG's interval_out)."""
        m = self.months
        if m == 0:
            return "00:00:00"
        neg = m < 0
        sign = -1 if neg else 1
        years, mons = divmod(abs(m), 12)
        parts = []
        if years:
            parts.append(
                f"{sign * years} year" + ("s" if years != 1 or neg else "")
            )
        if mons:
            parts.append(
                f"{sign * mons} mon" + ("s" if mons != 1 or neg else "")
            )
        return " ".join(parts)


def _ym_from_internal(self, obj):  # noqa: ANN001 - pyspark signature
    if obj is None:
        return None
    return YearMonthInterval(obj)


def install() -> None:
    """Idempotently patch YearMonthIntervalType.fromInternal."""
    if getattr(YearMonthIntervalType.fromInternal, "_gfw_compat", False):
        return
    _ym_from_internal._gfw_compat = True
    YearMonthIntervalType.fromInternal = _ym_from_internal
