import subprocess, sys
r = subprocess.run([sys.executable, "-u", "bench.py", "--smoke"], cwd="/root/repo")
sys.exit(r.returncode)
