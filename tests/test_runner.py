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
    from datetime import datetime

    date_str = datetime.now().strftime(cfg.output_date_format)
    assert [p.name for p in result.human_files] == [
        f"{cfg.output_file_prefix}mailing_EPB_{date_str}.csv"
    ]
    human_csv = result.human_files[0].read_text(encoding="utf-8")
    assert "111" in human_csv and "BLOQUEADO" not in human_csv
    assert "84999990000" in human_csv  # enrichment phone landed
    assert result.metrics == {
        "human": 1, "robot": 0, "rejected": 1, "audit_leaks": 0,
    }
    rejected_lines = result.rejected_file.read_text(encoding="utf-8").splitlines()
    assert len(rejected_lines) == 2  # header + the one blocked row
    assert "motivo_remocao" in rejected_lines[0] and "BLOQUEADO" in rejected_lines[1]
    assert result.robot_files[0].name == (
        f"{cfg.robot_output_file_prefix}08_horas_{date_str}.csv"
    )
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


def test_runner_fanout_reads_from_cache(spark, input_dir, tmp_path, monkeypatch):
    """Persist fix (VERDICT r1 #1): every per-product/slot write and every
    metric count must hit the persisted frames (InMemoryRelation in the
    plan), not re-run the mailing DAG; caches are released afterwards."""
    from python_etl_mailing_automation_spark.pipeline import runner as runner_mod
    from python_etl_mailing_automation_spark.sources.io import write_exact_csv

    captured = []

    def spy_write(df, out_path, **kw):
        captured.append(df._jdf.queryExecution().optimizedPlan().toString())
        return write_exact_csv(df, out_path, **kw)

    monkeypatch.setattr(runner_mod, "write_exact_csv", spy_write)
    cfg = PipelineConfig(
        blocklist=["bloqueado"], corte_humano_maior_igual=50.0,
        robot_time_slot_groups={"08HRS": ["EPB", "EMT"]},
    )
    # Other tests in the shared session may hold their own caches; the
    # assertion below is that THIS run adds none. Compare ID SETS, not
    # sizes: the async ContextCleaner may release earlier tests' GC'd
    # caches mid-test, legitimately SHRINKING the map under load.
    def cached_ids():
        return set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toString()
            .strip("[]").replace(" ", "").split(",")
        ) - {""}

    baseline_cached = cached_ids()
    run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=tmp_path / "out_cache",
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv", regras_pattern="Tabulacoes*.csv",
    )
    # robot slot + rejected writes go through write_exact_csv directly;
    # write_partitioned_by_key wraps it internally for human files.
    assert captured, "spy saw no writes"
    assert all("InMemoryRelation" in plan for plan in captured)
    # unpersist ran: no cached RDDs left behind by the job (cleaner
    # shrinkage of pre-existing ids is fine).
    assert cached_ids() <= baseline_cached


def test_runner_multisheet_enrichment(spark, input_dir, tmp_path, monkeypatch):
    """Multi-sheet workbook enrichment: every sheet feeds the phone union
    (data_loader.py:30-35,57-61). The Excel shim is faked (openpyxl is not
    in this environment); the wiring under test is runner-side."""
    from python_etl_mailing_automation_spark.sources import excel as excel_mod

    # Phone for d1 lives on sheet ONE, phone for d3 on sheet TWO.
    def fake_read_excel(spark_, path, *, sheet_name=0, normalize_headers=True):
        s1 = spark.createDataFrame(
            [("d1", "84911110000", "9")], ["documento", "telefone", "pontuacao"]
        )
        s2 = spark.createDataFrame(
            [("d3", "84922220000", "7")], ["documento", "telefone", "pontuacao"]
        )
        return {"Plan1": s1, "Plan2": s2} if sheet_name is None else s1

    monkeypatch.setattr(excel_mod, "read_excel", fake_read_excel)
    (input_dir / "Pontuacao_fones.csv").unlink()  # force the xlsx path
    (input_dir / "Pontuacao_fones.xlsx").write_bytes(b"fake workbook")

    cfg = PipelineConfig(corte_humano_maior_igual=0.0)
    result = run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=tmp_path / "out_sheets",
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.xlsx", regras_pattern="NO_MATCH_*",
    )
    text = "".join(p.read_text(encoding="utf-8") for p in result.human_files)
    assert "84911110000" in text  # sheet 1 phone
    assert "84922220000" in text  # sheet 2 phone — lost before this fix


def test_audit_archive_clean_and_leaky(spark, input_dir, tmp_path):
    """laudo zip parity (laudo.py:75-127): audit an existing run archive
    — extract, scan every CSV, skip the rejects report."""
    import shutil
    import zipfile

    from python_etl_mailing_automation_spark.pipeline.audit import (
        audit_archive,
        find_latest_archive,
    )

    cfg = PipelineConfig(
        blocklist=["bloqueado"], corte_humano_maior_igual=50.0,
        critical_statuses=["CLIENTE FALECIDO"], critical_threshold=1,
    )
    out = tmp_path / "out_zip"
    result = run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=out,
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv", regras_pattern="Tabulacoes*.csv",
        make_archive=True,
    )
    # Clean case: the just-shipped archive holds no blocked status.
    verdicts = audit_archive(spark, result.archive, cfg.blocklist)
    assert verdicts and all(v.clean for v in verdicts)
    assert not any("rejeitados" in v.file.name for v in verdicts)

    # Discovery mirrors the laudo's newest-archive glob.
    assert find_latest_archive(
        result.archive.parent, prefix=result.archive.name.split(".")[0][:3]
    ) == result.archive

    # Seeded leak: plant a blocked status inside a copy of the archive.
    leak_dir = tmp_path / "leak_src"
    leak_dir.mkdir()
    (leak_dir / "Mailing_X.csv").write_text(
        "CPF;bloq\n999;BLOQUEADO\n", encoding="utf-8"
    )
    leaky_zip = shutil.make_archive(str(tmp_path / "leaky"), "zip", leak_dir)
    leaky = audit_archive(spark, leaky_zip, cfg.blocklist)
    assert [v.leaks for v in leaky] == [1] and not leaky[0].clean

    # Corrupted archive surfaces as BadZipFile (laudo.py:88-90).
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"not a zip")
    with pytest.raises(zipfile.BadZipFile):
        audit_archive(spark, bad, cfg.blocklist)


def test_counted_report_renders_reference_table(spark, input_dir, tmp_path):
    """Per-stage counts + rendered report (logger_setup.py:27-77 parity):
    stage names match processing_pipeline.py:317-347, counts reconcile,
    and the rendered table carries the reference's layout."""
    cfg = PipelineConfig(
        blocklist=["bloqueado"], corte_humano_maior_igual=50.0,
        critical_statuses=["CLIENTE FALECIDO"], critical_threshold=1,
    )
    result = run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=tmp_path / "out_report",
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv", regras_pattern="Tabulacoes*.csv",
        state_path=tmp_path / "state_report.json", counted_report=True,
    )
    names = [s.name for s in result.report.stages]
    assert names == [
        "Carregamento de Dados",
        "Remoção por Tabulação",
        "Deduplicação por 'ncpf'",
        "Cálculo de Colunas Agregadas",
        "Enriquecimento de Telefones",
        "Criação de 'Cliente_Regulariza'",
        "Filtro de Bloqueio ('bloq')",
    ]
    by_name = {s.name: s for s in result.report.stages}
    assert by_name["Carregamento de Dados"].initial == 3
    assert by_name["Remoção por Tabulação"].removed == 1    # CPF 333 critical
    assert by_name["Filtro de Bloqueio ('bloq')"].removed == 1  # CPF 222 blocked
    assert by_name["Filtro de Bloqueio ('bloq')"].final == 1

    text = result.rendered_report
    assert "RELATÓRIO DE EXECUÇÃO DA AUTOMAÇÃO" in text
    assert "TABELA DE RESULTADOS" in text and "ANÁLISE DE OUTLIERS" in text
    assert f"| {'ETAPA DE PROCESSAMENTO':<40} | {'REMOVIDOS':>12} | {'RESTANTES':>12} |" in text
    assert f"| {'Registros Iniciais':<40} | {'-':>12} | {3:>12,} |" in text
    assert "primeira execução" in text  # no previous state

    # Second run: outlier analysis now compares against the saved state.
    result2 = run_mailing_job(
        spark, cfg, input_dir=input_dir, output_dir=tmp_path / "out_report2",
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv", regras_pattern="Tabulacoes*.csv",
        state_path=tmp_path / "state_report.json", counted_report=True,
    )
    assert "Arquivos HUMANOS: Gerado 0.00% a mais" in result2.rendered_report


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


def test_run_mailing_job_reference_exact_robot_names(spark, input_dir, tmp_path):
    """robot_time_in_name=True reproduces the reference's
    {prefix}{slot}_{HHMMSS}_{ddmmyyyy}.csv shape
    (gerador_robo_mestre.py:126-135), pinned via run_time."""
    from datetime import datetime

    cfg = PipelineConfig(
        blocklist=["bloqueado"],
        corte_humano_maior_igual=50.0,
        robot_time_slot_groups={"08HRS": ["EPB", "EMT"]},
    )
    fixed = datetime(2026, 8, 14, 9, 30, 5)
    result = run_mailing_job(
        spark,
        cfg,
        input_dir=input_dir,
        output_dir=tmp_path / "out2",
        mailing_pattern="MAILING_NUCLEO_*.csv",
        enrichment_pattern="Pontuacao*.csv",
        regras_pattern="Tabulacoes*.csv",
        robot_time_in_name=True,
        run_time=fixed,
    )
    assert result.robot_files[0].name == (
        f"{cfg.robot_output_file_prefix}08HRS_093005_14082026.csv"
    )
