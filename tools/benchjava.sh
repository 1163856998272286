#!/bin/bash
# Run graft.Bench without sbt — kept as the name every probe doc and
# prior-round artifact references; the JVM flags live in runjava.sh
# (one copy, no drift).
exec "$(dirname "$0")/runjava.sh" graft.Bench "$@"
