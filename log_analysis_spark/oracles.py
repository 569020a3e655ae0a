"""DuckDB oracle SQL building blocks.

``TRANSCRIPTS_SQL`` (datagen.py) is dialect-portable and runs verbatim in
both engines; the *parse* oracle below is DuckDB-dialect SQL that re-derives
the exact semantics of ``functions/parse.py`` so the driver can cross-check
every pipeline query at sf0.01.
"""

from __future__ import annotations

from log_analysis_spark.datagen import (
    ROLE_TAXONOMY_SQL,
    TOOL_REGISTRY_SQL,
    TRANSCRIPTS_SQL,
)

# DuckDB re-implementation of the parse stage (functions/parse.py).
# regexp_extract returns '' on miss in both engines; NULLIF+TRY_CAST gives
# null-on-fail tolerant casts matching Spark's try_cast.
_DUCK_PARSED = """
split_t AS (
  SELECT *, string_split(text, '|&|') AS _parts,
    CASE
      WHEN text LIKE 'ERROR!%' THEN 'error'
      WHEN text LIKE 'Profile timing:%' THEN 'timing'
      WHEN text LIKE 'BESLog::info()%' THEN 'info'
      WHEN text LIKE '%|&|request|&|%' THEN 'request'
      ELSE 'unknown'
    END AS turn_class
  FROM transcripts
),
parsed AS (
  SELECT
    conv_id, turn_idx, role, text, tool, ts, turn_class,
    TRY_CAST(NULLIF(COALESCE(
      NULLIF(regexp_extract(text, 'HTTP code of ([0-9]+)', 1), ''),
      CASE WHEN turn_class = 'request'
           THEN regexp_extract(_parts[5], '^([A-Z]+) ([^ ]+) ([0-9]+)$', 3) END
    ), '') AS INTEGER) AS http_code,
    TRY_CAST(NULLIF(regexp_extract(text, 'attempt: ([0-9]+)', 1), '') AS INTEGER) AS attempt,
    NULLIF(regexp_extract(text, '\\(([A-Za-z_]+\\.(?:cc|h|py|jl):[0-9]+)\\)', 1), '') AS code_ref,
    TRY_CAST(NULLIF(regexp_extract(text, 'gather ([0-9]+) responses', 1), '') AS INTEGER) AS n_responses,
    TRY_CAST(NULLIF(regexp_extract(text, 'responses: ([0-9.]+) ms', 1), '') AS DOUBLE) AS duration_ms,
    NULLIF(regexp_extract(text, 'Profile timing: ([^ ]+) - ', 1), '') AS action,
    NULLIF(regexp_extract(text, 'Cache (hit|miss|put),', 1), '') AS cache_op,
    COALESCE(
      CASE WHEN turn_class = 'request'
           THEN NULLIF(regexp_extract(_parts[5], '^([A-Z]+) ([^ ]+) ([0-9]+)$', 2), '') END,
      NULLIF(regexp_extract(text, 'path: ([^ ]+)$', 1), '')
    ) AS url_path,
    CASE WHEN turn_class = 'request'
         THEN NULLIF(regexp_extract(_parts[5], '^([A-Z]+) ([^ ]+) ([0-9]+)$', 1), '') END AS http_method,
    CASE WHEN turn_class = 'request' THEN TRY_CAST(_parts[1] AS BIGINT) END AS req_epoch,
    CASE WHEN turn_class = 'request' THEN _parts[2] END AS instance_id,
    CASE WHEN turn_class = 'request' THEN TRY_CAST(_parts[3] AS INTEGER) END AS pid
  FROM split_t
)
"""

PARSED_PRELUDE = (
    f"WITH transcripts AS ({TRANSCRIPTS_SQL}),\n{_DUCK_PARSED}"
)

TRANSCRIPTS_PRELUDE = f"WITH transcripts AS ({TRANSCRIPTS_SQL})"


def on_parsed(body: str) -> str:
    """Wrap a SELECT body that reads from ``parsed``."""
    return f"{PARSED_PRELUDE}\n{body}"


def on_transcripts(body: str) -> str:
    return f"{TRANSCRIPTS_PRELUDE}\n{body}"


def with_dims(sql: str) -> str:
    """Prefix CTEs for the lookup dims (usable inside on_parsed bodies via
    plain subselects instead)."""
    return sql.replace("__ROLE_TAXONOMY__", f"({ROLE_TAXONOMY_SQL})").replace(
        "__TOOL_REGISTRY__", f"({TOOL_REGISTRY_SQL})"
    )
