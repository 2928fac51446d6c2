from . import macros  # registers builtin macro rewrites
from . import ids  # registers id/digest/rng macros (import side effect)
from . import yamlenc  # registers to_yaml/from_yaml rule-text macros
