"""Human-readable run report — the engine's answer to the reference's
Data-Docs rebuild (``UpdateDataDocsAction``,
``/root/reference/great_expectations/checkpoints/retail_source_checkpoint.yml:16-19``):
instead of a static HTML site rendered from JSON stores, one markdown
document per pipeline run, written next to the catalog, derived from
the typed ValidationResults the run already holds (no extra jobs)."""

from __future__ import annotations

import os

from greatex_spark.expectations.compiler import ValidationResult


def render_run_report(
    run_name: str,
    epoch: int,
    validations: dict[str, ValidationResult],
    counts: dict[str, int] | None = None,
) -> str:
    lines = [
        f"# Run report — `{run_name}` (epoch {epoch})",
        "",
        "| gate | suite | success | expectations | success % |",
        "|---|---|---|---|---|",
    ]
    for gate, vr in validations.items():
        s = vr.statistics
        lines.append(
            f"| {gate} | {vr.suite_name} | {'PASS' if vr.success else 'FAIL'} "
            f"| {s['successful_expectations']}/{s['evaluated_expectations']} "
            f"| {s['success_percent']:.1f} |"
        )
    if counts:
        lines += ["", "## Row counts", ""]
        lines += [f"- `{t}`: {n:,}" for t, n in counts.items()]
    lines += ["", "## Failed expectations", ""]
    any_fail = False
    for gate, vr in validations.items():
        for r in vr.results:
            if r.success:
                continue
            any_fail = True
            kw = r.expectation_config.get("kwargs", {})
            lines.append(
                f"- **{gate}** / `{r.expectation_config['expectation_type']}`"
                f" ({kw.get('column', kw.get('rule_name', ''))}):"
                f" unexpected={r.result.get('unexpected_count', 'n/a')}"
                f" of {r.result.get('element_count', 'n/a')}"
            )
            sample = r.result.get("partial_unexpected_list")
            if sample:
                lines.append(f"  - sample: {sample[:5]}")
    if not any_fail:
        lines.append("*(none)*")
    lines.append("")
    return "\n".join(lines)


def write_run_report(
    catalog_root: str,
    run_name: str,
    epoch: int,
    validations: dict[str, ValidationResult],
    counts: dict[str, int] | None = None,
) -> str:
    """Write the report under ``<catalog>/reports/`` and return its path."""
    report_dir = os.path.join(catalog_root, "reports")
    os.makedirs(report_dir, exist_ok=True)
    path = os.path.join(report_dir, f"run-{epoch}-{run_name}.md")
    with open(path, "w") as f:
        f.write(render_run_report(run_name, epoch, validations, counts))
    return path
