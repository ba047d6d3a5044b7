#!/bin/bash
# Poll the sbt tmux pane until the forked run finishes; print the tail.
n=${1:-60}
for i in $(seq 1 "$n"); do
  sleep 10
  if tmux capture-pane -t sbt -p | tail -4 | grep -qE "\[success\]|\[error\]"; then break; fi
done
tmux capture-pane -t sbt -p | grep -E "\[error\]|error\]|\[success\]|Exception|failed" | tail -10
