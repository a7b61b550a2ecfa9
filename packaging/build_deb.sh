#!/bin/bash
# Build syzgy-tpu_<version>_all.deb with dpkg-deb (no fpm needed).
# Reference parity: Makefile:30-63 deb target + postinst/prerm hooks.
#
# Layout:
#   /usr/lib/syzgy-tpu/          the python package (incl. native .so)
#   /usr/bin/syzgy-tpu           launcher (python3 -m syzgydb_tpu.tools.cli)
#   /etc/syzgy.conf              config (conffile, preserved on upgrade)
#   /lib/systemd/system/syzgy-tpu.service
#
# The JAX/TPU python stack is an environment prerequisite, not a .deb
# dependency — TPU images ship their own pinned jax builds.
set -euo pipefail

VERSION=${VERSION:-0.2.0}
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT

make -C "$ROOT" native >/dev/null

PKGLIB="$STAGE/usr/lib/syzgy-tpu"
mkdir -p "$PKGLIB" "$STAGE/usr/bin" "$STAGE/etc" \
         "$STAGE/lib/systemd/system" "$STAGE/DEBIAN"

cp -r "$ROOT/syzgydb_tpu" "$PKGLIB/"
find "$PKGLIB" -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
# the ctypes core loads from the package's native/ dir
mkdir -p "$PKGLIB/syzgydb_tpu/native"
cp "$ROOT"/native/*.so "$PKGLIB/syzgydb_tpu/native/" 2>/dev/null || true
cp -r "$ROOT/html" "$PKGLIB/html"

cat > "$STAGE/usr/bin/syzgy-tpu" <<'EOF'
#!/bin/bash
export PYTHONPATH="/usr/lib/syzgy-tpu${PYTHONPATH:+:$PYTHONPATH}"
exec python3 -m syzgydb_tpu.tools.cli "$@"
EOF
chmod 755 "$STAGE/usr/bin/syzgy-tpu"

cp "$ROOT/packaging/syzgy.conf" "$STAGE/etc/syzgy.conf"
cp "$ROOT/packaging/syzgy-tpu.service" \
   "$STAGE/lib/systemd/system/syzgy-tpu.service"

cat > "$STAGE/DEBIAN/control" <<EOF
Package: syzgy-tpu
Version: $VERSION
Section: database
Priority: optional
Architecture: all
Depends: python3 (>= 3.10)
Maintainer: syzgydb-tpu
Description: TPU-native vector database (SyzgyDB-compatible REST API)
 Durable span-log storage, quantized columnar vectors, sign-sketch ANN
 with MXU rerank, sharded multi-chip search. Requires a working JAX
 TPU/CPU python environment (jax, flax, numpy).
EOF
echo "/etc/syzgy.conf" > "$STAGE/DEBIAN/conffiles"
install -m 755 "$ROOT/packaging/postinst" "$STAGE/DEBIAN/postinst"
install -m 755 "$ROOT/packaging/prerm" "$STAGE/DEBIAN/prerm"

OUT="$ROOT/syzgy-tpu_${VERSION}_all.deb"
dpkg-deb --build --root-owner-group "$STAGE" "$OUT" >/dev/null
echo "$OUT"
