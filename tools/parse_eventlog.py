#!/usr/bin/env python3
"""Per-job breakdown of a Spark event log directory.

Usage: parse_eventlog.py <event_dir> [label]

Prints one line per job (submit->end wall ms, stage names) plus gaps
between consecutive jobs (driver-side time: planning, collect handling).
"""
import io
import json
import os
import subprocess
import sys


def main() -> None:
    evdir = sys.argv[1]
    files = [os.path.join(evdir, f) for f in os.listdir(evdir)
             if not f.startswith('.')]
    assert files, f'no event logs under {evdir}'
    path = max(files, key=os.path.getmtime)
    if os.path.isdir(path):  # rolling event log v2 layout
        parts = sorted(f for f in os.listdir(path) if f.startswith('events_'))
        assert parts, f'no events_* under {path}'
        path = os.path.join(path, parts[-1])
    jobs = {}
    stage_info = {}
    app_start = app_end = None
    if path.endswith('.zstd'):
        raw = subprocess.run(['zstd', '-dc', path], capture_output=True,
                             check=True).stdout
        fh_ctx = io.StringIO(raw.decode('utf-8', errors='replace'))
    else:
        fh_ctx = open(path)
    with fh_ctx as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get('Event')
            if ev == 'SparkListenerApplicationStart':
                app_start = e['Timestamp']
            elif ev == 'SparkListenerApplicationEnd':
                app_end = e['Timestamp']
            elif ev == 'SparkListenerJobStart':
                jid = e['Job ID']
                jobs[jid] = {
                    'start': e['Submission Time'],
                    'stages': [s['Stage ID'] for s in e['Stage Infos']],
                    'desc': (e.get('Properties') or {}).get(
                        'spark.job.description', ''),
                    'callsite': (e.get('Properties') or {}).get(
                        'callSite.short', ''),
                }
                for s in e['Stage Infos']:
                    stage_info[s['Stage ID']] = {
                        'name': s['Stage Name'], 'tasks': s['Number of Tasks']}
            elif ev == 'SparkListenerJobEnd':
                if e['Job ID'] in jobs:
                    jobs[e['Job ID']]['end'] = e['Completion Time']
            elif ev == 'SparkListenerStageCompleted':
                si = e['Stage Info']
                d = stage_info.setdefault(si['Stage ID'], {})
                d['name'] = si['Stage Name']
                d['tasks'] = si['Number of Tasks']
                if 'Completion Time' in si and 'Submission Time' in si:
                    d['ms'] = si['Completion Time'] - si['Submission Time']

    label = sys.argv[2] if len(sys.argv) > 2 else ''
    print(f'== jobs for {label} ({os.path.basename(path)}) ==')
    prev_end = app_start
    total = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if 'end' not in j:
            continue
        dur = j['end'] - j['start']
        gap = j['start'] - prev_end if prev_end else 0
        prev_end = j['end']
        total += dur
        stages = ' | '.join(
            f"s{sid}:{stage_info.get(sid, {}).get('name', '?')[:40]}"
            f"[{stage_info.get(sid, {}).get('tasks', '?')}t"
            f",{stage_info.get(sid, {}).get('ms', '-')}ms]"
            for sid in j['stages'])
        print(f'job {jid:3d} {dur:6d}ms gap {gap:6d}ms '
              f'{j["callsite"][:30]:30s} {stages[:160]}')
    if app_start and app_end:
        print(f'app wall {app_end - app_start} ms; sum(job) {total} ms; '
              f'driver-only {app_end - app_start - total} ms')


if __name__ == '__main__':
    main()
