#!/usr/bin/env python3
"""Verify (and optionally fix) SURVEY.md §2.C query citations against HEAD.

Each §2.C row cites `graft/<path>.scala:<line>` for a declared query. The
ground truth is the `QueryDef("name"...)` / `QueryDef.noOracle("name")`
declaration line in src/main/scala. Usage:

  python3 tools/check_survey_citations.py          # report drift
  python3 tools/check_survey_citations.py --fix    # rewrite SURVEY.md lines
"""
import re
import subprocess
import sys

FIX = "--fix" in sys.argv

# query name -> (file, line) from the source tree
decl = {}
out = subprocess.check_output(
    ["grep", "-rn", r'QueryDef\(\.noOracle\)\?("', "--include=*.scala",
     "src/main/scala"], text=True)
for ln in out.splitlines():
    m = re.match(r'(src/main/scala/([^:]+)):(\d+):.*QueryDef(?:\.noOracle)?\("([a-z0-9_]+)"', ln)
    if m:
        decl[m.group(4)] = (m.group(2), int(m.group(3)))

survey = open("SURVEY.md").read().splitlines()
drift, missing, fixed = [], [], 0
for i, ln in enumerate(survey):
    m = re.match(r'\| `([a-z0-9_]+)` \| (oracle|spec) \| graft/([^:]+):(\d+) \|', ln)
    if not m:
        continue
    name, path, line = m.group(1), "graft/" + m.group(3), int(m.group(4))
    if name not in decl:
        missing.append(name)
        continue
    tpath, tline = decl[name]
    if (tpath, tline) != (path, line):
        drift.append((name, f"{path}:{line}", f"{tpath}:{tline}"))
        if FIX:
            survey[i] = re.sub(r'graft/[^:]+:\d+', tpath + f":{tline}", ln, count=1)
            fixed += 1

if FIX and fixed:
    open("SURVEY.md", "w").write("\n".join(survey) + "\n")

table_names = {re.match(r'\| `([a-z0-9_]+)`', ln).group(1)
               for ln in survey if re.match(r'\| `[a-z0-9_]+` \| (oracle|spec) \|', ln)}
undeclared = sorted(set(decl) - table_names)

print(f"table rows: {len(table_names)}; source decls: {len(decl)}")
for name, old, new in drift:
    print(f"DRIFT {name}: {old} -> {new}" + (" [fixed]" if FIX else ""))
for name in missing:
    print(f"NO-DECL {name} (cited in SURVEY, no QueryDef found)")
for name in undeclared:
    print(f"NOT-IN-TABLE {name} (declared in source, missing from SURVEY)")
if not drift and not missing and not undeclared:
    print("clean")
