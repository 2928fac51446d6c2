"""Rule documentation: ``/** ... @param ... @return ... */`` prefixes on
rule/lambda/output SQL, plus markdown generation for a suite.

Reference: impl/util/DocsParsing.scala:87-166 (combinator parser; here a
small regex scanner with the same token grammar) and
impl/util/Docs.scala (markdown generation).  Spark's SQL parser treats
``/** ... */`` as a bracketed comment, so documented rule text still
compiles unchanged; ``strip_comments`` exists for display purposes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional

from ..model import RuleSuite

__all__ = ["Docs", "parse_docs", "strip_comments", "rule_suite_docs", "docs_markdown"]


@dataclass(frozen=True)
class Docs:
    description: str = ""
    params: Dict[str, str] = field(default_factory=dict)
    return_description: str = ""


_DOC_RE = re.compile(r"/\*\*(?P<body>.*?)\*/", re.DOTALL)
_TOKEN_RE = re.compile(r"@(param|return)\b")


def _clean_body(body: str) -> str:
    """Remove leading ``*`` gutters (scaladoc style); if any line lacks
    the gutter the body is markdown and is left alone (reference:
    DocsParsing.cleanDocs)."""
    lines = body.split("\n")
    if len(lines) > 1 and all(re.match(r"^\s*\*", ln) or not ln.strip() for ln in lines[1:]):
        return "\n".join(
            [lines[0]] + [re.sub(r"^\s*\*", "", ln) for ln in lines[1:]]
        )
    return body


def parse_docs(sql: str) -> Optional[Docs]:
    """Docs from a leading ``/** ... */`` block, None when absent."""
    m = _DOC_RE.search(sql)
    if m is None or sql[: m.start()].strip():
        return None  # doc must lead the expression
    body = _clean_body(m.group("body"))

    # split into description / @param / @return segments
    segments = []
    pos = 0
    for tok in _TOKEN_RE.finditer(body):
        segments.append(body[pos : tok.start()])
        pos = tok.start()
    segments.append(body[pos:])

    description = segments[0].strip() if segments else ""
    params: Dict[str, str] = {}
    ret = ""
    for seg in segments[1:]:
        seg = seg.strip()
        if seg.startswith("@param"):
            rest = seg[len("@param") :].strip()
            parts = rest.split(None, 1)
            if parts:
                params[parts[0]] = parts[1].strip() if len(parts) > 1 else ""
        elif seg.startswith("@return"):
            ret = seg[len("@return") :].strip()
    return Docs(description, params, ret)


def strip_comments(sql: str) -> str:
    """Rule text without its leading doc block."""
    m = _DOC_RE.search(sql)
    if m is None or sql[: m.start()].strip():
        return sql
    return sql[m.end() :].strip()


def rule_suite_docs(suite: RuleSuite) -> Dict[str, Dict]:
    """{'rules': {(ids): Docs}, 'lambdas': {...}} for every documented
    expression of the suite (undocumented entries get empty Docs —
    reference: RuleSuiteDocs, impl/util/Docs.scala:17-20)."""
    rules = {}
    for rs in suite.rule_sets:
        for r in rs.rules:
            rules[(suite.id, rs.id, r.id)] = parse_docs(r.expression.rule) or Docs()
    lambdas = {
        (suite.id, fn.id): parse_docs(fn.rule) or Docs()
        for fn in suite.lambda_functions
    }
    outputs = {}
    for rs in suite.rule_sets:
        for r in rs.rules:
            if r.run_on_pass is not None and r.run_on_pass.output is not None:
                outputs[(suite.id, rs.id, r.id)] = (
                    parse_docs(r.run_on_pass.output.rule) or Docs()
                )
    return {"rules": rules, "lambdas": lambdas, "outputExpressions": outputs}


def docs_markdown(suite: RuleSuite) -> str:
    """Markdown reference page for a suite (rules grouped per ruleset,
    lambdas appended), sql blocks shown without doc comments."""
    docs = rule_suite_docs(suite)
    out = [f"# RuleSuite {suite.id.id} v{suite.id.version}", ""]
    for rs in suite.rule_sets:
        out.append(f"## RuleSet {rs.id.id} v{rs.id.version}")
        out.append("")
        for r in rs.rules:
            d = docs["rules"][(suite.id, rs.id, r.id)]
            out.append(f"### Rule {r.id.id} v{r.id.version}")
            if d.description:
                out.append(d.description)
            out.append("```sql")
            out.append(strip_comments(r.expression.rule))
            out.append("```")
            if d.params:
                out.append("| param | doc |")
                out.append("|---|---|")
                for k, v in d.params.items():
                    out.append(f"| {k} | {v} |")
            if d.return_description:
                out.append(f"**returns** {d.return_description}")
            out.append("")
    if suite.lambda_functions:
        out.append("## Lambdas")
        out.append("")
        for fn in suite.lambda_functions:
            d = docs["lambdas"][(suite.id, fn.id)]
            out.append(f"### {fn.name} ({fn.id.id} v{fn.id.version})")
            if d.description:
                out.append(d.description)
            out.append("```sql")
            out.append(strip_comments(fn.rule))
            out.append("```")
            if d.params:
                out.append("| param | doc |")
                out.append("|---|---|")
                for k, v in d.params.items():
                    out.append(f"| {k} | {v} |")
            if d.return_description:
                out.append(f"**returns** {d.return_description}")
            out.append("")
    return "\n".join(out)
