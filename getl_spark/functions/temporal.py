"""Offset-preserving TIMESTAMP_WITH_TIMEZONE handling.

Reference parity: getl Field.TIMESTAMP_WITH_TIMEZONE
(/root/reference/src/main/groovy/getl/data/Field.groovy:41-44; proto
round-trip /root/reference/src/test/groovy/getl/jdbc/
JDBCDriverProto.groovy:66-86,180-230).

Spark has no offset-carrying timestamp type: TimestampType stores an
INSTANT, rendered in the session time zone (this engine pins every
session to UTC — session.py). The documented normalization is:

- the instant is preserved exactly (``tz_parse``'s ``instant`` equals
  the source wall clock shifted to UTC);
- the ORIGINAL offset survives in a companion ``int`` column
  (minutes east of UTC), so ``tz_format`` reproduces the source
  string byte-for-byte.

Everything is built-in Catalyst expressions (cast/regexp/interval
arithmetic) — no Python UDFs, fully codegen'd, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# trailing zone designator: 'Z', '+05:30', '-0800', '+07' — anchored
# to a PRECEDING time-of-day component so a date-only literal's day
# field ('2024-01-02') is never misread as an offset
_OFFSET_RE = r"\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?\s*(Z|[+-]\d{2}(?::?\d{2})?)\s*$"


def tz_offset_minutes(ts_str: Column | str) -> Column:
    """Minutes east of UTC from a literal's trailing offset designator
    (``Z``/``+05:30``/``-0800``/``+07``); NULL when the string carries
    no explicit offset. The designator only counts when it follows a
    time-of-day component — date-only strings have no offset."""
    c = F.col(ts_str) if isinstance(ts_str, str) else ts_str
    tok = F.regexp_extract(F.trim(c), _OFFSET_RE, 1)
    sign = F.when(F.substring(tok, 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    digits = F.when(tok == "Z", F.lit("0000")).otherwise(
        F.rpad(F.translate(F.substring(tok, 2, 6), ":", ""), 4, "0")
    )
    hours = F.substring(digits, 1, 2).try_cast("int")
    mins = F.substring(digits, 3, 2).try_cast("int")
    return F.when(tok == "", F.lit(None).cast("int")).otherwise(
        sign * (hours * 60 + mins)
    )


def tz_parse(ts_str: Column | str) -> Column:
    """Parse an offseted timestamp literal into
    ``struct(instant timestamp, tz_offset_min int)``.

    The instant comes from Spark's native string->timestamp cast (which
    honors trailing offsets, UTC-normalizing under the session-UTC
    discipline); the offset is extracted lexically so it is not lost to
    the normalization. ``try_cast`` keeps malformed input NULL instead
    of an ANSI throw.
    """
    c = F.col(ts_str) if isinstance(ts_str, str) else ts_str
    return F.struct(
        c.try_cast("timestamp").alias("instant"),
        tz_offset_minutes(c).alias("tz_offset_min"),
    )


def tz_format(instant: Column | str, tz_offset_min: Column | str) -> Column:
    """Render an instant back in its original offset:
    ``yyyy-MM-dd HH:mm:ss[+-]HH:MM`` (``+00:00`` for UTC). The exact
    inverse of :func:`tz_parse` for second-precision inputs."""
    i = F.col(instant) if isinstance(instant, str) else instant
    o = F.col(tz_offset_min) if isinstance(tz_offset_min, str) else tz_offset_min
    o = F.coalesce(o, F.lit(0))
    local = i + F.make_interval(mins=o)
    sign = F.when(o < 0, F.lit("-")).otherwise(F.lit("+"))
    a = F.abs(o)
    suffix = F.concat(
        sign,
        F.lpad((a / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((a % 60).cast("string"), 2, "0"),
    )
    return F.concat(F.date_format(local, "yyyy-MM-dd HH:mm:ss"), suffix)
