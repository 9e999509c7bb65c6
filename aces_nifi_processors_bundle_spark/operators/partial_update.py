"""O4 — keyed partial upsert/merge with Mongo-update-operator semantics.

Reference: PartialUpdateMongo (mongodb/PartialUpdateMongo.java:63;
trigger :174-251, update build :277-429, exec :431-496). The NiFi
processor parses each FlowFile into update docs and applies
$set / $addToSet(+$each) / $currentDate / $inc against a keyed MongoDB
collection, upserting when unmatched (:446), single-doc updateOne or
match-many updateMany (:469-476), bulk-unordered for array input
(:451), then routes by modifiedCount (:253-275).

Spark mapping (SURVEY.md §4 custom-work #1): a MERGE expressed as
  pre-combined source  ⟂ full-outer-join on keys ⟂  target
with per-property update expressions; the post-state IS the result
DataFrame (persist to parquet/Delta as desired; wrap in foreachBatch
under streaming).

Operator → expression map:
- $set          → src value when present else keep target (skip-when-
                  absent, :344-349,361-366); one-level "parent.child"
                  dot paths via withField (:537-543 enforces exactly
                  two segments); property "*" = whole-document update
                  (:304-305)
- $inc          → tgt + src (:359-367,421-424); missing tgt counts as 0
- $currentDate  → fixed "now" timestamp from config (:313-314,:378-381;
                  injected instead of current_timestamp() so runs are
                  deterministic and oracle-checkable)
- $addToSet     → array_union(tgt, src) — exact $addToSet set semantics
                  (:315-354,382-417); scalar src = 1-element array
                  (:411-412); the "time"-substring epoch→timestamp
                  fixup on array-of-struct elements (:646-672) is an
                  explicit configured field list here, with the
                  substring heuristic as a compat flag
- upsert        → unmatched source rows inserted (:446); off → dropped
- match-many    → a key may match multiple target rows (updateMany,
                  :473-475): the same combined source row applies to
                  each. Multiple source rows per key are pre-combined
                  (last-non-null for $set, sum for $inc, flatten-
                  distinct for $addToSet) — exactly how the reference's
                  unordered bulkWrite converges.

Routing (:253-275): success (rows actually changed + inserts),
success-unmodified (matched but identical). Change detection compares
old vs new values — the analog of UpdateResult.modifiedCount.

Scale notes: both sides shuffle once on the keys; the target scan
prunes to key + updated columns; a small source batch broadcast-joins
under AQE automatically. Pre-combining the source reuses the same key
partitioning as the join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Operation = Literal["$set", "$addToSet", "$inc", "$currentDate"]


@dataclass
class PartialUpdateConfig:
    keys: list[str]
    # property name (or "parent.child", or "*") → operation
    operations: dict[str, Operation] = field(default_factory=dict)
    upsert: bool = True
    mode: Literal["one", "many"] = "one"
    # Deterministic stand-in for the server-side $currentDate clock.
    now: str = "2026-01-01 00:00:00"
    # Struct fields holding epoch-millis longs converted to timestamps
    # inside $addToSet arrays-of-structs (PartialUpdateMongo.java:646-672).
    time_fixup_fields: list[str] = field(default_factory=list)
    # Compat flag: reference's `"time"`-substring key heuristic (:656).
    time_substring_heuristic: bool = False
    # Optional source ordering column for multi-row-per-key batches:
    # $set takes the non-null value at the greatest order_col instead of
    # F.last(ignorenulls=True), which is partition-order-dependent under
    # real shuffles. The reference's unordered bulkWrite (:451) has the
    # same nondeterminism; order_col makes corpus-scale runs reproducible.
    order_col: str | None = None


@dataclass
class PartialUpdateResult:
    post_state: DataFrame
    success: DataFrame
    success_unmodified: DataFrame
    # The full merged frame with its `_route` column — lets a storage
    # layer write post-state and collect routing counts via a single
    # observed pass (stores/keyed_table.py) instead of three jobs.
    merged: DataFrame | None = None


def _split_path(prop: str) -> tuple[str, str | None]:
    parts = prop.split(".")
    if len(parts) == 1:
        return prop, None
    if len(parts) == 2:  # exactly two segments enforced at :539-540
        return parts[0], parts[1]
    raise ValueError(
        f"property path {prop!r}: only one-level parent.child supported "
        "(PartialUpdateMongo.java:539-540)"
    )


def _combine_sources(src: DataFrame, cfg: PartialUpdateConfig) -> DataFrame:
    """Collapse multiple source rows per key (unordered-bulk convergence)."""

    def _pick(c: str) -> Column:
        # Non-null value at the greatest order_col; rows whose value is
        # null get a null ordering key, which max_by skips — exactly
        # "last non-null", but deterministic under shuffle.
        if cfg.order_col is not None:
            return F.max_by(
                F.col(c), F.when(F.col(c).isNotNull(), F.col(cfg.order_col))
            ).alias(c)
        return F.last(F.col(c), ignorenulls=True).alias(c)

    if "*" in cfg.operations:
        others = [c for c in src.columns if c not in cfg.keys and c != cfg.order_col]
        aggs = {c: _pick(c) for c in others}
        return src.groupBy(*cfg.keys).agg(*aggs.values())
    src_types = dict(src.dtypes)
    src_schema = {f.name: f.dataType for f in src.schema.fields}
    aggs: dict[str, Column] = {}
    for prop, op in cfg.operations.items():
        parent, _child = _split_path(prop)
        if parent in aggs or parent not in src.columns:
            continue
        if op == "$inc" and _child is None:
            aggs[parent] = F.sum(F.col(parent)).alias(parent)
        elif op == "$addToSet" and _child is not None:
            # struct parent: merge each source row's CHILD values into
            # one set and rebuild a struct carrying just that field —
            # the merge reads it back with getField(child). (collect_set
            # over the whole parent struct would make array<struct>,
            # which the downstream array_union cannot consume.)
            inner = F.col(parent).getField(_child)
            ctype = next(
                str(f.dataType.simpleString())
                for f in src_schema[parent].fields
                if f.name == _child
            )
            merged_child = (
                F.array_distinct(F.flatten(F.collect_list(inner)))
                if ctype.startswith("array")
                else F.collect_set(inner)
            )
            aggs[parent] = F.struct(merged_child.alias(_child)).alias(parent)
        elif op == "$addToSet" and not src_types.get(parent, "").startswith("array"):
            aggs[parent] = F.collect_set(F.col(parent)).alias(parent)
        elif op == "$addToSet":
            aggs[parent] = F.array_distinct(
                F.flatten(F.collect_list(F.col(parent)))
            ).alias(parent)
        else:  # $set (incl. parent.child struct), $currentDate carries none
            aggs[parent] = _pick(parent)
    if not aggs:
        return src.dropDuplicates(cfg.keys)
    return src.groupBy(*cfg.keys).agg(*aggs.values())


def _time_fixup(arr: Column, struct_fields: list[str], cfg: PartialUpdateConfig) -> Column:
    """Epoch-millis long struct fields → timestamp before array-append."""
    targets = (
        [f for f in struct_fields if "time" in f.lower()]
        if cfg.time_substring_heuristic
        else [f for f in cfg.time_fixup_fields if f in struct_fields]
    )
    def _fixer(fname: str):
        # one-arg lambda: F.transform derives lambda-variable count from arity
        return lambda e: e.withField(
            fname, F.timestamp_millis(e.getField(fname).cast("long"))
        )

    out = arr
    for fname in targets:
        out = F.transform(out, _fixer(fname))
    return out


def partial_update(
    target: DataFrame, source: DataFrame, cfg: PartialUpdateConfig
) -> PartialUpdateResult:
    """Apply the partial-update merge; returns post-state + routed frames."""
    keys = cfg.keys
    src = _combine_sources(source, cfg)
    src_types = dict(src.dtypes)
    tgt_types = dict(target.dtypes)

    # EXPLICIT presence markers: deriving matched/source_only from
    # keys[0] nullness breaks on null-key rows — a null-key TARGET row
    # looked source_only and was replaced by an all-null insert (or
    # dropped outright with upsert=False), and a null-key source row
    # matching via eqNullSafe was misclassified the same way.
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = src.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    matched = (
        F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    )
    source_only = F.col("t._t_present").isNull()

    if cfg.mode == "one":
        # updateOne (PartialUpdateMongo.java:469-471, the reference
        # DEFAULT): at most one matched target row per key takes the
        # update. Mongo's pick is unspecified; ours is deterministic
        # when any orderable non-key column distinguishes the rows
        # (maps are unorderable and excluded from the tiebreak).
        from pyspark.sql import Window as _W

        orderable = [
            F.col(f"t.{c}")
            for c, typ in tgt_types.items()
            if c not in keys and not typ.startswith("map<")
        ]
        rn = F.row_number().over(
            _W.partitionBy(*[F.col(f"t.{k}") for k in keys]).orderBy(
                F.col("t._t_present").asc_nulls_last(),
                *[o.asc_nulls_first() for o in orderable],
            )
        )
        matched = matched & (rn == 1)

    ops = dict(cfg.operations)
    whole_doc = ops.pop("*", None) == "$set"

    # Build per-column new-value expressions for matched rows.
    new_vals: dict[str, Column] = {}
    for col_name in target.columns:
        tcol = F.col(f"t.{col_name}")
        if col_name in keys:
            new_vals[col_name] = F.coalesce(tcol, F.col(f"s.{col_name}"))
            continue
        new_val = tcol
        if whole_doc and col_name in src_types:
            scol = F.col(f"s.{col_name}")
            new_val = F.when(matched & scol.isNotNull(), scol).otherwise(new_val)
        for prop, op in ops.items():
            parent, child = _split_path(prop)
            if parent != col_name:
                continue
            has_src = parent in src_types
            scol = F.col(f"s.{parent}") if has_src else F.lit(None)
            if op == "$currentDate" and child is None:
                new_val = F.when(matched, F.lit(cfg.now).cast("timestamp")).otherwise(new_val)
            elif op == "$currentDate":
                # {$currentDate: {"parent.child": true}} stamps the
                # NESTED field (the reference passes the dotted path
                # straight to Mongo) — replacing the whole struct with
                # a timestamp wouldn't even analyze
                new_val = F.when(
                    matched,
                    new_val.withField(child, F.lit(cfg.now).cast("timestamp")),
                ).otherwise(new_val)
            elif not has_src:
                continue  # skip-when-absent (:344-349,361-366)
            elif op == "$set" and child is None:
                new_val = F.when(matched & scol.isNotNull(), scol).otherwise(new_val)
            elif op == "$set":
                # fixChildOfParentForOpSet: applies only when the source
                # parent struct is present (:563); else no-op.
                src_child = scol.getField(child)
                new_val = F.when(
                    matched & scol.isNotNull() & src_child.isNotNull(),
                    new_val.withField(child, src_child),
                ).otherwise(new_val)
            elif op == "$inc" and child is None:
                new_val = F.when(
                    matched & scol.isNotNull(),
                    F.coalesce(new_val, F.lit(0)) + scol,
                ).otherwise(new_val)
            elif op == "$inc":
                # dot-path $inc ({$inc: {"parent.child": v}} in Mongo)
                src_child = scol.getField(child)
                new_val = F.when(
                    matched & scol.isNotNull() & src_child.isNotNull(),
                    new_val.withField(
                        child, F.coalesce(new_val.getField(child), F.lit(0)) + src_child
                    ),
                ).otherwise(new_val)
            elif op == "$addToSet" and child is None:
                add = scol if src_types[parent].startswith("array") else F.array(scol)
                elem = target.schema[parent].dataType.elementType
                if hasattr(elem, "fields"):
                    add = _time_fixup(add, [f.name for f in elem.fields], cfg)
                empty = F.array().cast(target.schema[parent].dataType)
                new_val = F.when(
                    matched & scol.isNotNull(),
                    F.array_union(F.coalesce(new_val, empty), add),
                ).otherwise(new_val)
            elif op == "$addToSet":
                src_child = scol.getField(child)
                new_val = F.when(
                    matched & scol.isNotNull() & src_child.isNotNull(),
                    new_val.withField(
                        child,
                        F.array_union(
                            F.coalesce(new_val.getField(child), src_child), src_child
                        ),
                    ),
                ).otherwise(new_val)
        new_vals[col_name] = new_val

    # Mongo `$set` CREATES a missing field (UpdateMongo analog: a $set
    # path absent from the target doc is added, not dropped). Top-level
    # columns named by a $set op and present in the source but absent
    # from the target become ADDED columns: matched rows take the
    # source value, pre-existing rows read NULL. (Dot-path creation
    # and other ops stay skip-when-absent, as documented.)
    added_cols: list[str] = []
    for prop, op in ops.items():
        parent, child = _split_path(prop)
        if (
            op == "$set"
            and child is None
            and parent not in tgt_types
            and parent in src_types
        ):
            added_cols.append(parent)
            new_vals[parent] = F.when(
                matched, F.col(f"s.{parent}")
            ).otherwise(F.lit(None).cast(src_types[parent]))

    changed = F.lit(False)
    for col_name in target.columns:
        if col_name not in keys:
            changed = changed | ~F.col(f"t.{col_name}").eqNullSafe(new_vals[col_name])
    for col_name in added_cols:
        # gaining a non-null value for a brand-new field modifies the doc
        changed = changed | F.col(f"s.{col_name}").isNotNull()

    # Insert projection for unmatched source rows (upsert path, :446).
    # Mongo applies the update operators to the new doc on upsert: $inc
    # from 0 = the source value, $addToSet on absent = the source array,
    # $set = the source value — all covered by projecting the source —
    # and $currentDate stamps the new doc too.
    currentdate_props = {
        _split_path(p)[0] for p, op in cfg.operations.items() if op == "$currentDate"
    }
    addtoset_top = {
        _split_path(p)[0]
        for p, op in cfg.operations.items()
        if op == "$addToSet" and _split_path(p)[1] is None
    }
    currentdate_dot = {
        _split_path(p)[0]: _split_path(p)[1]
        for p, op in cfg.operations.items()
        if op == "$currentDate" and _split_path(p)[1] is not None
    }
    insert_vals: dict[str, Column] = {}
    for col_name in target.columns:
        if col_name in currentdate_props and col_name not in currentdate_dot:
            insert_vals[col_name] = F.lit(cfg.now).cast("timestamp").cast(tgt_types[col_name])
        elif col_name in currentdate_dot:
            # dot-path $currentDate on upsert stamps the nested field
            # of the inserted doc (casting the whole struct column to
            # timestamp would not analyze)
            base = (
                F.col(f"s.{col_name}").cast(tgt_types[col_name])
                if col_name in src_types
                else F.struct(
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in target.schema[col_name].dataType.fields
                    ]
                )
            )
            insert_vals[col_name] = base.withField(
                currentdate_dot[col_name], F.lit(cfg.now).cast("timestamp")
            )
        elif col_name in src_types and col_name in addtoset_top:
            # same shaping as the matched path: wrap scalars, run the
            # epoch-millis fixup — a plain cast read millis as SECONDS
            # on inserted docs (and scalar->array didn't analyze)
            iv = F.col(f"s.{col_name}")
            if not src_types[col_name].startswith("array"):
                iv = F.array(iv)
            elem = target.schema[col_name].dataType.elementType
            if hasattr(elem, "fields"):
                iv = _time_fixup(iv, [f.name for f in elem.fields], cfg)
            insert_vals[col_name] = iv.cast(tgt_types[col_name])
        elif col_name in src_types:
            insert_vals[col_name] = F.col(f"s.{col_name}").cast(tgt_types[col_name])
        else:
            insert_vals[col_name] = F.lit(None).cast(tgt_types[col_name])
    for col_name in added_cols:
        insert_vals[col_name] = F.col(f"s.{col_name}")

    route = (
        F.when(matched & changed, "success")
        .when(matched, "success-unmodified")
        .when(source_only & F.lit(cfg.upsert), "insert")
        .when(source_only, "drop")
        .otherwise("untouched")
    )
    merged = joined.select(
        *[
            F.when(source_only, insert_vals[c]).otherwise(new_vals[c]).alias(c)
            for c in [*target.columns, *added_cols]
        ],
        route.alias("_route"),
    )
    post = merged.filter(F.col("_route") != "drop").drop("_route")
    success = merged.filter(F.col("_route").isin("success", "insert")).drop("_route")
    unmodified = merged.filter(F.col("_route") == "success-unmodified").drop("_route")
    return PartialUpdateResult(post, success, unmodified, merged)
