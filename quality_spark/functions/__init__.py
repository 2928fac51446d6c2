from . import macros  # registers builtin macro rewrites
from . import ids  # registers id/digest/rng macros (import side effect)
