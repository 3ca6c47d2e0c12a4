"""Model evaluation over lake tables (#105): classification report.

The missing half of running classifiers in the pipeline (#26 langid,
#85 quality classifier): measuring them. Standard multi-class
precision / recall / F1 per label (the scikit-learn
``classification_report`` shape, public since forever), computed as
DataFrame plans so a 100 TB prediction table evaluates in one
confusion-matrix aggregation:

- ONE groupBy (pred, gold) builds the confusion matrix — output
  cardinality |labels|², label-scale not data-scale;
- everything else (per-label totals, diagonal, metrics) derives from
  that tiny frame; metrics are single exact-count divisions, so the
  DuckDB oracle reproduces every double bit-for-bit;
- a label with no predictions has NULL precision (0/0 is undefined,
  not zero) and the F1 of a NULL precision/recall is NULL — both
  engines agree because the CASE/when guards are structurally
  identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_report(
    df: DataFrame, pred_col: str, gold_col: str
) -> DataFrame:
    """Per-label (label, support, tp, fp, fn, precision, recall, f1).

    Labels must be NON-NULL: a NULL label never matches the per-label
    equi-joins, so its counts would silently vanish from the totals —
    filter or fillna("(missing)") a nullable prediction column first.
    """
    cm = (
        df.select(F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g"))
        .groupBy("_p", "_g")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    labels = (
        cm.select(F.col("_p").alias("label"))
        .union(cm.select(F.col("_g").alias("label")))
        .distinct()
    )
    pred_tot = cm.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_n").alias("_ptot")
    )
    gold_tot = cm.groupBy(F.col("_g").alias("label")).agg(
        F.sum("_n").alias("_gtot")
    )
    diag = cm.where(F.col("_p") == F.col("_g")).select(
        F.col("_p").alias("label"), F.col("_n").alias("_tp")
    )
    j = (
        labels.join(diag, "label", "left")
        .join(pred_tot, "label", "left")
        .join(gold_tot, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("_tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("_ptot"), F.lit(0)).alias("_ptot"),
            F.coalesce(F.col("_gtot"), F.lit(0)).alias("_gtot"),
        )
    )
    prec = F.when(
        F.col("_ptot") > 0, F.col("tp").cast("double") / F.col("_ptot").cast("double")
    )
    rec = F.when(
        F.col("_gtot") > 0, F.col("tp").cast("double") / F.col("_gtot").cast("double")
    )
    out = j.select(
        "label",
        F.col("_gtot").alias("support"),
        "tp",
        (F.col("_ptot") - F.col("tp")).alias("fp"),
        (F.col("_gtot") - F.col("tp")).alias("fn"),
        prec.alias("precision"),
        rec.alias("recall"),
    )
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        F.lit(2.0)
        * F.col("precision")
        * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    )
    return out.withColumn("f1", f1)


def cohen_kappa(df: DataFrame, pred_col: str, gold_col: str) -> DataFrame:
    """Chance-corrected agreement between two label columns (#164).

    Cohen's kappa (Cohen 1960, public formula): observed agreement
    corrected by the agreement two independent raters with the same
    marginals would reach by chance. Computed entirely from the
    |labels|²-cardinality confusion aggregation — the same one-shuffle
    shape as :func:`classification_report` — then rearranged so every
    division input is an exact integer:

        kappa = (n·Σ_tp − Σ_l row_l·col_l) / (n² − Σ_l row_l·col_l)

    (multiply po = Σtp/n and pe = Σ row·col / n² through by n²). The
    products row·col and n² overflow int64 once n passes ~3e9 rows —
    realistic at the 100 TB target — and non-ANSI Spark would wrap
    silently where DuckDB raises. They are therefore computed in
    DECIMAL(38,0) (exact integers to 38 digits, order-independent
    sums), mirrored by HUGEINT in the DuckDB oracle; only the final
    division inputs are cast to double, one exactly-rounded op per
    output value — engine-identical to n ~ 1e15.

    Returns one row: n, n_agree, po, pe, kappa. Degenerate case pe = 1
    (both raters constant, same label) reports NULL kappa — undefined,
    not zero.

    NULL labels: a NULL in either column counts toward ``n`` but never
    toward ``n_agree`` (NULL = NULL is not true) and never toward the
    marginal product (the row/col marginal join on ``_p = _g`` is
    null-unsafe, so each side's NULL-key marginal drops out). NULL-
    bearing inputs therefore DEFLATE both po and pe rather than
    treating NULL as a label — kappa's domain here is non-NULL labels.
    Coalesce to a sentinel label first (``fillna("(missing)")``) if
    NULL should participate as a real category.
    """
    cm = (
        df.groupBy(
            F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
        ).agg(F.count(F.lit(1)).alias("_m"))
    )
    rows = cm.groupBy("_p").agg(F.sum("_m").alias("_r"))
    cols = cm.groupBy("_g").agg(F.sum("_m").alias("_c"))
    dec = "decimal(19,0)"
    cross = (
        rows.join(cols, rows["_p"] == cols["_g"])
        .agg(
            F.coalesce(
                F.sum(F.col("_r").cast(dec) * F.col("_c").cast(dec)),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_rc")
        )
    )
    base = cm.agg(
        F.sum("_m").alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("_p") == F.col("_g"), F.col("_m"))), F.lit(0)
        ).alias("_agree"),
    )
    n2 = F.col("_n").cast(dec) * F.col("_n").cast(dec)
    return base.crossJoin(F.broadcast(cross)).select(
        F.col("_n").cast("bigint").alias("n"),
        F.col("_agree").cast("bigint").alias("n_agree"),
        (F.col("_agree").cast("double") / F.col("_n").cast("double")).alias("po"),
        (F.col("_rc").cast("double") / n2.cast("double")).alias("pe"),
        F.when(
            n2 != F.col("_rc"),
            (
                F.col("_n").cast(dec) * F.col("_agree").cast(dec)
                - F.col("_rc")
            ).cast("double")
            / (n2 - F.col("_rc")).cast("double"),
        ).alias("kappa"),
    )
