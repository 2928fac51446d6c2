"""quality_spark — a PySpark-native data-quality / rule-engine library.

Rules are SQL text stored as data; the driver compiles them into plain
``pyspark.sql.Column`` trees (no UDFs, no custom expressions) so
Catalyst plans, optimises, and codegens everything. See SURVEY.md for
the full blueprint.
"""

from .model import (
    DEFAULT_SALIENCE,
    DISABLED_RULE_INT,
    FAILED_INT,
    PASSED_INT,
    SOFT_FAILED_INT,
    ExpressionRule,
    Id,
    LambdaFunction,
    OutputExpression,
    Rule,
    RuleSet,
    RuleSuite,
    RuleSuiteMap,
    RunOnPassProcessor,
    engine_rule,
    engine_suite,
    pack_id,
    rule_suite,
    unpack_id,
)
from .operators.engine import add_rule_engine, rule_engine_runner, rule_engine_with_struct
from .operators.folder import add_folder, fold_and_replace_fields, rule_folder_runner
from .operators.expression_runner import add_expression_runner, strip_result_ddl
from .results import (
    flatten_struct_type,
    rule_suite_details_result_type,
    rule_suite_result_type,
)
from .operators.runner import (
    add_data_quality,
    add_overall_results_and_details,
    rule_runner,
    rule_runner_details,
)
from .sources.serializing import (
    to_output_expression_df,
    integrate_lambdas,
    integrate_output_expressions,
    read_lambdas_from_df,
    read_output_expressions_from_df,
    read_rules_from_df,
    to_lambda_df,
    to_rule_suite_df,
)
from .sources.versioning import (
    MetaRuleSet,
    integrate_meta_rule_sets,
    integrate_versioned_lambdas,
    integrate_versioned_output_expressions,
    read_meta_rule_sets_from_df,
    read_versioned_lambdas_from_df,
    read_versioned_output_expressions_from_df,
    read_versioned_rules_from_df,
)
from .plans.validation import ValidationIssue, process_if_attribute_missing, validate
from .functions.register import register_quality_functions
from .functions.yamlenc import from_yaml, to_yaml
from .plans.docs import Docs, docs_markdown, parse_docs, strip_comments
from .sources.bigbloom import BigBloom, big_bloom_from, load_big_bloom, register_big_bloom
from .sources.parquet_compat import read_parquet_compat
from .functions.lambdas import LambdaRegistry, expand_sql
from .functions import api as funcs
from .sparkless import DuckDBProcessor, RowProcessor, dq_factory

__all__ = [
    "DEFAULT_SALIENCE",
    "DISABLED_RULE_INT",
    "FAILED_INT",
    "PASSED_INT",
    "SOFT_FAILED_INT",
    "ExpressionRule",
    "Id",
    "LambdaFunction",
    "LambdaRegistry",
    "OutputExpression",
    "Rule",
    "RuleSet",
    "RuleSuite",
    "RuleSuiteMap",
    "RunOnPassProcessor",
    "DuckDBProcessor",
    "RowProcessor",
    "dq_factory",
    "add_data_quality",
    "add_expression_runner",
    "strip_result_ddl",
    "add_folder",
    "add_overall_results_and_details",
    "add_rule_engine",
    "engine_rule",
    "engine_suite",
    "fold_and_replace_fields",
    "rule_engine_runner",
    "rule_engine_with_struct",
    "rule_folder_runner",
    "expand_sql",
    "flatten_struct_type",
    "funcs",
    "integrate_lambdas",
    "integrate_output_expressions",
    "pack_id",
    "read_lambdas_from_df",
    "read_output_expressions_from_df",
    "read_rules_from_df",
    "rule_runner",
    "rule_runner_details",
    "rule_suite",
    "rule_suite_details_result_type",
    "rule_suite_result_type",
    "to_lambda_df",
    "to_rule_suite_df",
    "unpack_id",
]
