#!/bin/bash
# Pre-populate the persistent XLA compile cache for dryrun_multichip so the
# driver's invocation replays compiled executables instead of spending
# minutes in LLVM on this 1-core sandbox.
cd "$(dirname "$0")/.." && python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
