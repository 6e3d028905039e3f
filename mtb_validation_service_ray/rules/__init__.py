from .core import Rule, RuleSet, RuleContext, evaluate_row_rules  # noqa: F401
from .registry import default_image_ruleset  # noqa: F401
