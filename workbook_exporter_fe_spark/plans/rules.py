"""Prometheus-style recording + alerting rules over the PromQL front-end.

The reference emits scrape configs whose downstream ecosystem is
prometheus rule files (`groups: - record: ... expr: ...` /
`- alert: ... expr: ... for: ...`); this module evaluates that rule
model engine-side, batch-style, over tier tables registered in a
:class:`~workbook_exporter_fe_spark.plans.promql.MetricStore`.

- **Recording rules** evaluate a PromQL expression and register the
  result back into the store under the recorded metric name, so later
  rules in the same group can reference it (prometheus's intra-group
  chaining). The registered frame is the PLAN, not materialized data —
  chained rules compose into one Catalyst tree; call sites decide
  where to persist (e.g. commit each output to a SnapshotTable).
- **Alerting rules** use PromQL filter semantics (a series is a firing
  candidate at t exactly when the expr emits it at t) plus the `for:`
  duration: an alert is `firing` at t only when the series was present
  at EVERY grid step of the trailing `for` window, else `pending`.
  Streaks are computed with the island trick — tsec/step − row_number()
  is constant exactly on consecutive-step runs — one window pass per
  alert, no self-joins, no UDFs.

Scale: everything inherits the PromQL compiler's shapes (RANGE frames
over (labels, ts)-sorted series); the island pass adds one same-sort
window. Rule groups are plan composition only — N chained rules still
execute as one job per materialized output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .promql import MetricStore, PromQL, PromQLError, Vector, parse


@dataclass(frozen=True)
class RecordingRule:
    record: str  # output metric name
    expr: str


@dataclass(frozen=True)
class AlertingRule:
    alert: str
    expr: str
    for_s: float = 0.0  # `for:` duration, seconds
    step_s: float = 60.0  # evaluation grid step of the underlying tiers


class RuleEngine:
    """Evaluate an ordered rule group against a MetricStore."""

    def __init__(self, store: MetricStore) -> None:
        self.store = store
        self._pq = PromQL(store)

    def run(
        self, rules: list[RecordingRule | AlertingRule]
    ) -> dict[str, DataFrame]:
        """Evaluate rules in order; returns {rule name: output frame}.

        Recording outputs are (labels..., ts, value) and are registered
        into the store for later rules. Alert outputs add a ``state``
        column (``firing`` / ``pending``)."""
        out: dict[str, DataFrame] = {}
        for rule in rules:
            if isinstance(rule, RecordingRule):
                vec = self._pq._eval(parse(rule.expr))
                if isinstance(vec, float):
                    raise PromQLError(
                        f"recording rule {rule.record!r} evaluates to a scalar"
                    )
                df = vec.df.select(*vec.labels, "ts", "value")
                self.store._metrics[rule.record] = (df, vec.labels)
                out[rule.record] = df
            elif isinstance(rule, AlertingRule):
                out[rule.alert] = self._alert(rule)
            else:  # pragma: no cover
                raise TypeError(type(rule))
        return out

    def _alert(self, rule: AlertingRule) -> DataFrame:
        vec = self._pq._eval(parse(rule.expr))
        if isinstance(vec, float) or not isinstance(vec, Vector):
            raise PromQLError(f"alert {rule.alert!r} needs a vector expr")
        labels = vec.labels
        step = int(rule.step_s)
        need = int(rule.for_s // rule.step_s) + 1  # samples in a full streak
        d = vec.df.withColumn(
            "_tsec", F.col("ts").cast("timestamp").cast("long")
        )
        wo = (
            Window.partitionBy(*labels).orderBy("_tsec")
            if labels
            else Window.orderBy("_tsec")
        )
        # island id: constant across consecutive grid steps, changes at
        # any gap — so a streak is one (labels, island) run
        island = (F.col("_tsec") / step).cast("long") - F.row_number().over(wo)
        d = d.withColumn("_isl", island)
        wisl = (
            Window.partitionBy(*labels, "_isl").orderBy("_tsec")
            if labels
            else Window.partitionBy("_isl").orderBy("_tsec")
        )
        streak = F.row_number().over(wisl)
        state = F.when(streak >= need, F.lit("firing")).otherwise(
            F.lit("pending")
        )
        return (
            d.withColumn("state", state)
            .select(*labels, "ts", "value", "state")
        )


def run_rules(
    store: MetricStore, rules: list[RecordingRule | AlertingRule]
) -> dict[str, DataFrame]:
    return RuleEngine(store).run(rules)
