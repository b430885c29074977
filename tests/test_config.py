"""INI config bridge: reference-layout config.ini parses into
PipelineConfig (SURVEY.md §1.4)."""

from __future__ import annotations

from python_etl_mailing_automation_spark.config import PipelineConfig, load_config

REFERENCE_LAYOUT_INI = """
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
08_horas = EPB, EMT
09_horas = ECE
"""


def test_load_config_reference_layout(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(REFERENCE_LAYOUT_INI, encoding="utf-8")
    cfg = load_config(path)
    assert cfg.required_mailing_columns == ["empresa", "ucv", "nomecad", "ndoc", "ncpf"]
    assert cfg.required_tabulacoes_columns == ["idcliente"]
    assert cfg.critical_statuses == ["CLIENTE FALECIDO", "NAO PERTENCE A UC"]
    assert cfg.critical_threshold == 3
    # multiline blocklist keeps clean AND mojibake variants (by design)
    assert len(cfg.blocklist) == 3 and "LIGAÇÃO INDEVIDA" in cfg.blocklist
    assert cfg.priority_order == ["DESLIGADO", "ATÉ 30", "SIM"]
    assert cfg.corte_humano_maior_igual == 150.5
    assert cfg.human_export_columns == ["CPF", "NOME_CLIENTE", "PRODUTO"]
    assert cfg.robot_time_slot_groups == {"08_horas": ["EPB", "EMT"], "09_horas": ["ECE"]}


def test_load_config_defaults_when_missing(tmp_path):
    path = tmp_path / "empty.ini"
    path.write_text("[OUTRA]\nx = 1\n", encoding="utf-8")
    cfg = load_config(path)
    defaults = PipelineConfig()
    assert cfg.required_mailing_columns == defaults.required_mailing_columns
    assert cfg.critical_threshold == defaults.critical_threshold
    assert cfg.blocklist == []
