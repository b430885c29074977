"""INI config bridge (SURVEY.md §1.4).

Reads the same section/key layout as the reference's ``config.ini``
(paths, file patterns, required-column schemas, blocklists, export
layouts, priorities, segmentation cutoff, robot time-slot groups) into a
typed object the pipeline consumes. Dead sections the reference never
reads (``[PRE_FILTROS]``, SURVEY.md §8) are intentionally not modeled.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class PipelineConfig:
    """Semantic constants of the mailing pipeline.

    Defaults mirror the reference's production config
    (``/root/reference/config.ini``) closely enough for tests; real runs
    load an INI via :func:`load_config`.
    """

    # [SCHEMA_MAILING] required_columns (config.ini:79-92)
    required_mailing_columns: list[str] = field(
        default_factory=lambda: [
            "empresa", "ucv", "nomecad", "ndoc", "ncpf", "ano", "mes",
            "liquido", "loc", "sit", "faixa", "iu12m",
        ]
    )
    # [SCHEMA_TABULACOES] (config.ini:139-140)
    required_tabulacoes_columns: list[str] = field(default_factory=lambda: ["idcliente"])
    # [TABULACOES] critical statuses + threshold (config.ini:141-144)
    critical_statuses: list[str] = field(
        default_factory=lambda: ["CLIENTE FALECIDO", "NAO PERTENCE A UC"]
    )
    critical_threshold: int = 3
    # status_de_bloqueio_para_remover (config.ini:95-137) — clean and
    # mojibake variants are both enumerated, by design.
    blocklist: list[str] = field(default_factory=list)
    # [ORDENACAO] priority order (config.ini:150-156)
    priority_order: list[str] = field(default_factory=list)
    priority_match_columns: list[str] = field(
        default_factory=lambda: ["faixa", "sit", "iu12m"]
    )
    # [FILTROS_ESTRATEGICOS] (config.ini:146-148)
    corte_humano_maior_igual: float = 0.0
    # [EXPORT] column layouts (config.ini:19-63)
    human_export_columns: list[str] = field(default_factory=list)
    robot_export_columns: list[str] = field(default_factory=list)
    # [ROBO] time-slot product groups (config.ini:163-165)
    robot_time_slot_groups: dict[str, list[str]] = field(default_factory=dict)


def _split_list(raw: str) -> list[str]:
    return [x.strip() for x in raw.replace("\n", ",").split(",") if x.strip()]


def load_config(path: str | Path) -> PipelineConfig:
    """Load a reference-layout INI into a :class:`PipelineConfig`."""
    parser = configparser.ConfigParser(interpolation=None)
    parser.read(str(path), encoding="utf-8")
    cfg = PipelineConfig()

    def get_list(section: str, key: str, default: list[str]) -> list[str]:
        if parser.has_option(section, key):
            return _split_list(parser.get(section, key))
        return default

    cfg.required_mailing_columns = get_list(
        "SCHEMA_MAILING", "required_columns", cfg.required_mailing_columns
    )
    cfg.required_tabulacoes_columns = get_list(
        "SCHEMA_TABULACOES", "required_columns", cfg.required_tabulacoes_columns
    )
    cfg.critical_statuses = get_list(
        "TABULACOES", "status_criticos", cfg.critical_statuses
    )
    if parser.has_option("TABULACOES", "limiar_ocorrencias"):
        cfg.critical_threshold = parser.getint("TABULACOES", "limiar_ocorrencias")
    cfg.blocklist = get_list(
        "FILTROS", "status_de_bloqueio_para_remover", cfg.blocklist
    )
    cfg.priority_order = get_list("ORDENACAO", "prioridades", cfg.priority_order)
    if parser.has_option("FILTROS_ESTRATEGICOS", "corte_humano_maior_igual"):
        cfg.corte_humano_maior_igual = parser.getfloat(
            "FILTROS_ESTRATEGICOS", "corte_humano_maior_igual"
        )
    cfg.human_export_columns = get_list(
        "EXPORT", "colunas_humano", cfg.human_export_columns
    )
    cfg.robot_export_columns = get_list(
        "EXPORT", "colunas_robo", cfg.robot_export_columns
    )
    if parser.has_section("ROBO"):
        for key, raw in parser.items("ROBO"):
            cfg.robot_time_slot_groups[key] = _split_list(raw)
    return cfg
