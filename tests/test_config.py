"""INI config bridge: the reference's REAL config.ini layout parses into
PipelineConfig (SURVEY.md §1.4; ADVICE r1 high)."""

from __future__ import annotations

import shutil
from pathlib import Path

from python_etl_mailing_automation_spark.config import PipelineConfig, load_config

REFERENCE_INI = Path("/root/reference/config.ini")

# The engine's pre-round-2 invented layout — still honored as a fallback.
LEGACY_LAYOUT_INI = """
[SCHEMA_MAILING]
required_columns = empresa, ucv, nomecad, ndoc, ncpf

[SCHEMA_TABULACOES]
required_columns = idcliente

[TABULACOES]
status_criticos = CLIENTE FALECIDO, NAO PERTENCE A UC
limiar_ocorrencias = 3

[FILTROS]
status_de_bloqueio_para_remover = BLOQUEADO JUDICIAL,
    LIGAÇÃO INDEVIDA,
    LIGAÃÃO INDEVIDA

[ORDENACAO]
prioridades = DESLIGADO, ATÉ 30, SIM

[FILTROS_ESTRATEGICOS]
corte_humano_maior_igual = 150.5

[EXPORT]
colunas_humano = CPF, NOME_CLIENTE, PRODUTO
colunas_robo = CPF, valorTotal

[ROBO]
grupos_08hrs = EPB, EMT
grupos_09hrs = ECE
"""


def test_load_reference_config_verbatim(tmp_path):
    """A byte-for-byte copy of the production config.ini must load with
    every semantic knob populated (ADVICE r1: the old loader silently
    yielded an empty blocklist / no priorities / no export layouts)."""
    path = tmp_path / "config.ini"
    shutil.copyfile(REFERENCE_INI, path)
    cfg = load_config(path)

    # Schemas.
    assert cfg.required_mailing_columns == [
        "empresa", "ucv", "nomecad", "ndoc", "ncpf", "ano", "mes",
        "liquido", "loc", "sit", "faixa", "iu12m",
    ]
    assert cfg.required_tabulacoes_columns == ["idcliente"]

    # Blocklist comes from [SCHEMA_MAILING] status_de_bloqueio_para_remover:
    # 42 newline-separated entries, clean + mojibake variants.
    assert len(cfg.blocklist) == 42
    assert "AÇÃO DE COBRANÇA JUDICIAL (AUTOR)" in cfg.blocklist
    assert "bloqueio somente corte" in cfg.blocklist
    assert "AÃ‡ÃƒO JUDICIAL EM AVALIAÃ‡ÃƒO" in cfg.blocklist  # mojibake variant

    # Tabulações criticals ([SCHEMA_TABULACOES]).
    assert cfg.critical_statuses == ["CLIENTE FALECIDO", "NAO PERTENCE A UC"]
    assert cfg.critical_threshold == 3

    # Priorities ([PRIORITIES] order, upper-cased).
    assert cfg.priority_order == ["A VENCER", "LIGADO", "SIM", "DESLIGADO", "INATIVO"]

    # Segmentation ([SEGMENTACAO]).
    assert cfg.corte_humano_maior_igual == 0.0
    assert cfg.divida_filter_column == "valorDivida"

    # Export layouts ([EXPORT_COLUMNS]).
    assert cfg.human_export_columns[:3] == ["NOME_CLIENTE", "PRODUTO", "CPF"]
    assert len(cfg.human_export_columns) == 18
    assert cfg.robot_export_columns[0] == "NOME_CLIENTE"
    assert "RESP_NEG" in cfg.robot_export_columns
    assert len(cfg.robot_export_columns) == 23

    # Robot groups: grupos_* keys only; output_file_prefix is NOT a group.
    assert cfg.robot_time_slot_groups == {
        "08HRS": ["EPB", "EMR", "ESS", "ESE", "ETO"],
        "09HRS": ["ERO", "EMT", "EMS"],
        "10HRS": ["EAC"],
    }
    assert cfg.robot_output_file_prefix == "TOI_AD_FF_ENERGISA_"

    # Operational keys.
    assert cfg.paths["input_dir"] == "./data_input"
    assert cfg.paths["state_file"] == "./state.json"
    assert cfg.mailing_pattern == "MAILING_NUCLEO_*.xlsx"
    assert cfg.enrichment_pattern == "Pontuação*.xlsx"
    assert cfg.regras_pattern == "Tabulações para retirar*.xlsx"
    assert cfg.output_file_prefix == "Telecobranca_TOI_"
    assert cfg.output_date_format == "%d_%m_%Y"  # %% unescaped
    assert cfg.archive_name_prefix == "Mailing_Energisa_TOI_"
    assert cfg.source_columns["cpf"] == "ncpf"
    assert cfg.source_columns["bloqueio"] == "bloq"
    assert cfg.source_columns["vencimento_fatura"] == "dtvenc"


def test_load_config_legacy_layout(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(LEGACY_LAYOUT_INI, encoding="utf-8")
    cfg = load_config(path)
    assert cfg.required_mailing_columns == ["empresa", "ucv", "nomecad", "ndoc", "ncpf"]
    assert cfg.critical_statuses == ["CLIENTE FALECIDO", "NAO PERTENCE A UC"]
    assert cfg.critical_threshold == 3
    # multiline blocklist keeps clean AND mojibake variants (by design)
    assert len(cfg.blocklist) == 3 and "LIGAÇÃO INDEVIDA" in cfg.blocklist
    assert cfg.priority_order == ["DESLIGADO", "ATÉ 30", "SIM"]
    assert cfg.corte_humano_maior_igual == 150.5
    assert cfg.human_export_columns == ["CPF", "NOME_CLIENTE", "PRODUTO"]
    assert cfg.robot_time_slot_groups == {"08HRS": ["EPB", "EMT"], "09HRS": ["ECE"]}


def test_load_config_defaults_when_missing(tmp_path):
    path = tmp_path / "empty.ini"
    path.write_text("[OUTRA]\nx = 1\n", encoding="utf-8")
    cfg = load_config(path)
    defaults = PipelineConfig()
    assert cfg.required_mailing_columns == defaults.required_mailing_columns
    assert cfg.critical_threshold == defaults.critical_threshold
    assert cfg.blocklist == []
    assert cfg.source_columns["cpf"] == "ncpf"
