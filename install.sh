#!/usr/bin/env bash
# helix-tpu installer: clones/updates the package and wires the CLI onto PATH.
# (The reference installer resolves GitHub release binaries; helix-tpu is a
# Python package, so installation is a pip editable install or PYTHONPATH.)
set -euo pipefail

PREFIX="${HELIX_TPU_PREFIX:-$HOME/.helix-tpu/pkg}"
REPO_URL="${HELIX_TPU_REPO:-}"

if [ -n "$REPO_URL" ]; then
  if [ -d "$PREFIX/.git" ]; then
    git -C "$PREFIX" pull --ff-only
  else
    git clone "$REPO_URL" "$PREFIX"
  fi
else
  # Local install from the checkout containing this script.
  SRC="$(cd "$(dirname "$0")" && pwd)"
  mkdir -p "$PREFIX"
  PREFIX="$SRC"
fi

if python -m pip install -e "$PREFIX" 2>/dev/null; then
  echo "installed helix-tpu (pip editable)"
else
  BIN="$HOME/.local/bin"
  mkdir -p "$BIN"
  cat > "$BIN/helix-tpu" <<WRAP
#!/usr/bin/env bash
export PYTHONPATH="$PREFIX\${PYTHONPATH:+:\$PYTHONPATH}"
exec python -m helix_tpu.cli "\$@"
WRAP
  chmod +x "$BIN/helix-tpu"
  echo "installed wrapper at $BIN/helix-tpu (ensure it is on PATH)"
fi
python - <<'CHECK'
import sys
sys.path.insert(0, "$PREFIX")
import helix_tpu
print(f"helix-tpu {helix_tpu.__version__} ready")
CHECK
