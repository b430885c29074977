"""Robot (dialer) sub-pipeline (SURVEY.md §3.1 stage 3 robot branch).

Reference: ``gerar_arquivo_robo_mestre`` (gerador_robo_mestre.py:21-140):
parse due dates → rank invoices per CPF by due date → keep top 3 → pivot
wide → head row per CPF → join → layout → money formats → route to
time-slot groups.

Spark shape: two window passes + one pivot + one join, all shuffling on
CPF; the head-row pick uses explicit priority ordering (the reference
consumed the ambient global sort — SURVEY.md §7.3-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.dates import format_date_br
from ..functions.money import format_money_robot
from ..operators.ordering import head_row_per_group
from ..operators.pivot import rank_pivot_wide


def build_robot_output(
    robot_df: DataFrame,
    config: PipelineConfig,
    *,
    cpf_col: str = "CPF",
    due_col: str = "dtvenc",
    value_col: str = "liquido",
    barcode_col: str = "codbarra",
) -> DataFrame:
    """One row per CPF with per-rank invoice columns
    ``dtvenc_1..3 / liquido_1..3 / codbarra_1..3`` plus the head row's
    attributes and robot-formatted money columns."""
    cols = set(robot_df.columns)
    have_barcode = barcode_col in cols
    df = robot_df.filter(F.col(due_col).isNotNull())  # P8 guard (:41)

    value_cols = [due_col, value_col] + ([barcode_col] if have_barcode else [])
    order = [F.col(due_col).asc(), F.col(value_col).asc()]
    wide = rank_pivot_wide(df, cpf_col, order, value_cols, k=3)

    # A5: head row per CPF under explicit priority order.
    head_order = (
        [F.col("priority_level").asc()] if "priority_level" in cols else []
    ) + [F.col(due_col).asc(), F.col(value_col).asc()]
    head_cols = [
        c
        for c in robot_df.columns
        if c not in {cpf_col, due_col, value_col, barcode_col}
    ]
    head = head_row_per_group(df, cpf_col, head_order).select(cpf_col, *head_cols)

    out = head.join(wide, on=cpf_col, how="left")  # J2: both one-row-per-CPF
    for i in (1, 2, 3):
        out = out.withColumn(
            f"valorParcela_{i}", format_money_robot(F.col(f"{value_col}_{i}"))
        ).withColumn(f"dataVencimento_{i}", format_date_br(F.col(f"{due_col}_{i}")))
    if "valorDivida" in cols:
        out = out.withColumn("valorTotal", format_money_robot(F.col("valorDivida")))
    return out


def route_by_time_slot(
    robot_output: DataFrame, config: PipelineConfig, *, product_col: str = "PRODUTO"
) -> dict[str, DataFrame]:
    """S7: split the robot output into config-driven time-slot groups
    (gerador_robo_mestre.py:120-138; groups config.ini:163-165)."""
    return {
        slot: robot_output.filter(F.col(product_col).isin(products))
        for slot, products in config.robot_time_slot_groups.items()
    }
