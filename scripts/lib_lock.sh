# Shared mkdir-based locking for the operational chain scripts.
#
# flock(2) does NOT enforce across processes on this image's filesystem
# (verified: a child process re-opening the lock file takes a lock its
# parent already holds), so locks use the portable atomic-mkdir pattern
# with a pid file for stale-owner detection. Source this file, then:
#
#   acquire_lock logs/.myscript.lock.d || { echo busy; exit 1; }
#
# The lock auto-releases on EXIT (including SIGTERM via the trap); a
# SIGKILL leaves a stale dir that the next acquire steals after checking
# the recorded pid is dead.

acquire_lock () {
  local d="$1"
  mkdir -p "$(dirname "${d}")"
  local tries=0
  while ! mkdir "${d}" 2>/dev/null; do
    local owner
    owner="$(cat "${d}/pid" 2>/dev/null || true)"
    if [ -n "${owner}" ] && kill -0 "${owner}" 2>/dev/null; then
      return 1                      # live owner
    fi
    rm -rf "${d}"                   # stale (owner dead or never wrote pid)
    tries=$((tries + 1))
    [ "${tries}" -ge 3 ] && return 1
  done
  echo $$ > "${d}/pid"
  # shellcheck disable=SC2064  — expand ${d} now, not at trap time
  trap "rm -rf '${d}'" EXIT
  return 0
}
