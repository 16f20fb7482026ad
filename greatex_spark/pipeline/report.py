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


# --------------------------------------------------------------------------
# HTML data docs — the closer recast of the reference's static site
# (``great_expectations.yml:163-176`` renders validation stores to HTML
# with UpdateDataDocsAction).  Same data as the markdown report, rendered
# as one self-contained HTML page per run plus an index page listing
# every run — no JS, no external assets, written next to the catalog.

_HTML_STYLE = """
body{font-family:system-ui,sans-serif;margin:2rem auto;max-width:60rem;
     color:#1a1a1a;line-height:1.5}
table{border-collapse:collapse;width:100%;margin:1rem 0}
th,td{border:1px solid #d0d0d0;padding:.4rem .6rem;text-align:left}
th{background:#f5f5f5}
.pass{color:#116329;font-weight:600}
.fail{color:#a40e26;font-weight:600}
code{background:#f5f5f5;padding:.1rem .3rem;border-radius:3px}
"""


def _esc(s: object) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def render_run_report_html(
    run_name: str,
    epoch: int,
    validations: dict[str, ValidationResult],
    counts: dict[str, int] | None = None,
) -> str:
    rows = []
    for gate, vr in validations.items():
        s = vr.statistics
        cls = "pass" if vr.success else "fail"
        word = "PASS" if vr.success else "FAIL"
        rows.append(
            f"<tr><td>{_esc(gate)}</td><td><code>{_esc(vr.suite_name)}</code></td>"
            f'<td class="{cls}">{word}</td>'
            f"<td>{s['successful_expectations']}/{s['evaluated_expectations']}</td>"
            f"<td>{s['success_percent']:.1f}%</td></tr>"
        )
    fails = []
    for gate, vr in validations.items():
        for r in vr.results:
            if r.success:
                continue
            kw = r.expectation_config.get("kwargs", {})
            sample = r.result.get("partial_unexpected_list") or []
            fails.append(
                f"<li><b>{_esc(gate)}</b> / "
                f"<code>{_esc(r.expectation_config['expectation_type'])}</code> "
                f"({_esc(kw.get('column', kw.get('rule_name', '')))}) — "
                f"unexpected {_esc(r.result.get('unexpected_count', 'n/a'))} of "
                f"{_esc(r.result.get('element_count', 'n/a'))}"
                + (f"<br><small>sample: {_esc(sample[:5])}</small>" if sample else "")
                + "</li>"
            )
    counts_html = ""
    if counts:
        counts_html = "<h2>Row counts</h2><ul>" + "".join(
            f"<li><code>{_esc(t)}</code>: {n:,}</li>" for t, n in counts.items()
        ) + "</ul>"
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8">
<title>Run report — {_esc(run_name)} (epoch {epoch})</title>
<style>{_HTML_STYLE}</style></head><body>
<h1>Run report — <code>{_esc(run_name)}</code> (epoch {epoch})</h1>
<table><tr><th>gate</th><th>suite</th><th>result</th>
<th>expectations</th><th>success %</th></tr>
{''.join(rows)}
</table>
{counts_html}
<h2>Failed expectations</h2>
{('<ul>' + ''.join(fails) + '</ul>') if fails else '<p><i>(none)</i></p>'}
</body></html>
"""


def write_data_docs(
    catalog_root: str,
    run_name: str,
    epoch: int,
    validations: dict[str, ValidationResult],
    counts: dict[str, int] | None = None,
) -> str:
    """Write the HTML run page and refresh ``index.html`` under
    ``<catalog>/data_docs/``; returns the run page path."""
    docs_dir = os.path.join(catalog_root, "data_docs")
    os.makedirs(docs_dir, exist_ok=True)
    page = f"run-{epoch}-{run_name}.html"
    with open(os.path.join(docs_dir, page), "w") as f:
        f.write(render_run_report_html(run_name, epoch, validations, counts))
    pages = sorted(p for p in os.listdir(docs_dir) if p.startswith("run-"))
    items = "".join(f'<li><a href="{p}">{p}</a></li>' for p in pages)
    with open(os.path.join(docs_dir, "index.html"), "w") as f:
        f.write(
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>Data docs</title><style>{_HTML_STYLE}</style></head>"
            f"<body><h1>Validation run pages</h1><ul>{items}</ul></body></html>"
        )
    return os.path.join(docs_dir, page)
