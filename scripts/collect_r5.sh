#!/bin/bash
# Copy round-5 hardware transcripts + measurement reports into the repo and
# commit them.  Idempotent: re-runs refresh the same paths.  The commit is
# PATH-SCOPED so a concurrent builder session's staged-but-uncommitted work
# is never swept into the runbook's commit.
cd /root/repo
mkdir -p hw_transcripts/r5
for f in /tmp/r5_*.log; do
  [ -e "$f" ] && cp "$f" hw_transcripts/r5/;
done
# outage/recovery trail (probe failures, relay-refused heartbeats, recovery)
[ -e /tmp/tpu_watch5.log ] && cp /tmp/tpu_watch5.log hw_transcripts/r5/r5_watchdog.log
PATHS="hw_transcripts/r5"
for f in BENCH_DETAIL.md ROOFLINE.md BF16_AB.md BF16_AB_4096.md NOISE_AB.md; do
  [ -e "$f" ] && PATHS="$PATHS $f";
done
git add -- $PATHS 2>/dev/null  # new transcripts must be tracked to commit
if git status --porcelain -- $PATHS | grep -q .; then
  git commit -q -m "Land round-5 hardware transcripts and measurement reports

Raw stage logs from scripts/tpu_runbook_r5.sh (gates, headline bench,
trainstep, roofline, bf16 A/B, noise-variant A/B) copied verbatim so the
round record is readable without a live TPU.

No-Verification-Needed: measurement transcripts only, no code change" -- $PATHS
fi
