"""End-to-end job runner test: CSV inputs → discovery → validate →
process → human/robot/rejected sinks → audit → state → archive."""

from __future__ import annotations

import pytest

from python_etl_mailing_automation_spark.config import PipelineConfig
from python_etl_mailing_automation_spark.pipeline.runner import run_mailing_job
from python_etl_mailing_automation_spark.schema import SchemaValidationError


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "MAILING_NUCLEO_20260813.csv").write_text(
        "empresa;ucv;nomecad;ndoc;ncpf;ano;mes;liquido;loc;sit;faixa;iu12m;valor;bloq;dtvenc\n"
        "EPB;U1;Ana;d1;111;2026;8;100,50;NAT;LIGADO;Até 30;SIM;100,50;;05/01/2026\n"
        "EMT;U2;Bia;d2;222;2026;8;900,00;CGR;DESLIGADO;Até 90;NÃO;900,00;BLOQUEADO;15/02/2026\n"
        "EMT;U3;Caio;d3;333;2026;8;20,00;CGR;LIGADO;Até 30;NÃO;20,00;;01/03/2026\n",
        encoding="utf-8",
    )
    (d / "Pontuacao_fones.csv").write_text(
        "documento;telefone;pontuacao\nd1;84999990000;9\nd1;84999990001;5\n",
        encoding="utf-8",
    )
    (d / "Tabulacoes_retirar.csv").write_text(
        "idcliente;status\n333;CLIENTE FALECIDO\n", encoding="utf-8"
    )
    return d


def test_run_mailing_job_end_to_end(spark, input_dir, tmp_path):
    cfg = PipelineConfig(
        blocklist=["bloqueado"],
        priority_order=["DESLIGADO", "ATÉ 30"],
        corte_humano_maior_igual=50.0,
        critical_statuses=["CLIENTE FALECIDO"],
        critical_threshold=1,
        robot_time_slot_groups={"08_horas": ["EPB", "EMT"]},
    )
    out = tmp_path / "out"
    result = run_mailing_job(
        spark,
        cfg,
        input_dir=input_dir,
        output_dir=out,
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv",
        regras_pattern="Tabulacoes*.csv",
        state_path=tmp_path / "state.json",
        make_archive=True,
    )
    # 111 -> human (100.5 >= 50); 222 blocked; 333 removed by tabulações.
    assert [p.name for p in result.human_files] == ["Mailing_EPB.csv"]
    human_csv = result.human_files[0].read_text(encoding="utf-8")
    assert "111" in human_csv and "BLOQUEADO" not in human_csv
    assert "84999990000" in human_csv  # enrichment phone landed
    assert result.metrics == {
        "human": 1, "robot": 0, "rejected": 1, "audit_leaks": 0,
    }
    rejected_lines = result.rejected_file.read_text(encoding="utf-8").splitlines()
    assert len(rejected_lines) == 2  # header + the one blocked row
    assert "motivo_remocao" in rejected_lines[0] and "BLOQUEADO" in rejected_lines[1]
    assert result.robot_files[0].name == "ROBO_08_horas.csv"
    assert result.archive is not None and result.archive.exists()
    assert (tmp_path / "state.json").exists()


def test_run_mailing_job_schema_contract(spark, input_dir, tmp_path):
    (input_dir / "MAILING_NUCLEO_99999999.csv").write_text(
        "empresa;ncpf\nEPB;1\n", encoding="utf-8"
    )
    with pytest.raises(SchemaValidationError):
        run_mailing_job(
            spark,
            PipelineConfig(),
            input_dir=input_dir,
            output_dir=tmp_path / "out2",
            mailing_pattern="MAILING_NUCLEO_99999999.csv",
        )


def test_audit_output_dir_file_level(spark, input_dir, tmp_path):
    """laudo tool parity: file-level audit of written outputs, skipping
    the rejects report."""
    from python_etl_mailing_automation_spark.pipeline.audit import audit_output_dir

    cfg = PipelineConfig(
        blocklist=["bloqueado"], corte_humano_maior_igual=50.0,
        critical_statuses=["CLIENTE FALECIDO"], critical_threshold=1,
    )
    out = tmp_path / "out_audit"
    run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=out,
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv", regras_pattern="Tabulacoes*.csv",
    )
    verdicts = audit_output_dir(spark, out, cfg.blocklist)
    assert len(verdicts) >= 2                      # human + robot files
    assert all(v.clean for v in verdicts)          # invariant holds
    assert not any(
        "rejeitados" in v.file.name for v in verdicts
    )  # rejects report skipped


def test_human_file_rows_priority_ordered(spark, tmp_path):
    """O1 fidelity: rows inside each human file come out priority-sorted
    (level asc, debt desc) like the reference's final sort."""
    d = tmp_path / "in_ord"
    d.mkdir()
    d.joinpath("MAILING_NUCLEO_1.csv").write_text(
        "empresa;ucv;nomecad;ndoc;ncpf;ano;mes;liquido;loc;sit;faixa;iu12m;valor\n"
        "EPB;U1;A;d1;111;2026;8;10,00;NAT;LIGADO;Até 30;SIM;10,00\n"
        "EPB;U2;B;d2;222;2026;8;99,00;NAT;DESLIGADO;Até 90;NÃO;99,00\n"
        "EPB;U3;C;d3;333;2026;8;50,00;NAT;LIGADO;Até 30;NÃO;50,00\n",
        encoding="utf-8",
    )
    cfg = PipelineConfig(
        priority_order=["DESLIGADO", "ATÉ 30"], corte_humano_maior_igual=0.0
    )
    result = run_mailing_job(
        spark, cfg, input_dir=d, output_dir=tmp_path / "out_ord",
        mailing_pattern="MAILING_NUCLEO_*.csv",
    )
    lines = result.human_files[0].read_text(encoding="utf-8").splitlines()
    cpfs = [ln.split(";")[0] for ln in lines[1:]]
    # 222: DESLIGADO -> level 0 first; then level-1 rows by debt desc: 333 (50) before 111 (10)
    assert cpfs == ["222", "333", "111"]
