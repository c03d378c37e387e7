"""Job notifications + result backup.

Operational parity with the reference's job layer: completion/failure emails
via the system ``mail`` command (reference main.py:93-97, vsc/*.slurm:30) and
copying result artifacts to a persistent backup directory so scratch purges
don't lose runs (reference main.py:81-91, processor.py:125-133). Both
degrade to log lines when the facility isn't available.
"""

from __future__ import annotations

import os
import shutil
import subprocess

__all__ = ["send_mail", "backup_results"]


def send_mail(address: str | None, subject: str, body: str) -> bool:
    """Best-effort email via the system ``mail``; False when not sent."""
    if not address:
        return False
    mail = shutil.which("mail") or shutil.which("mailx")
    if mail is None:
        print(f"[notify] no mail command; {subject}: {body}")
        return False
    try:
        subprocess.run(
            [mail, "-s", subject, address],
            input=body.encode(),
            check=True,
            timeout=30,
        )
        return True
    except Exception as e:
        print(f"[notify] mail failed ({e}); {subject}")
        return False


def backup_results(out_dir: str, backup_dir: str | None) -> list[str]:
    """Copy result artifacts (CSV/PNG/checkpoints) to the backup directory."""
    if not backup_dir or os.path.abspath(backup_dir) == os.path.abspath(out_dir):
        return []
    os.makedirs(backup_dir, exist_ok=True)
    copied = []
    for name in sorted(os.listdir(out_dir)):
        src = os.path.join(out_dir, name)
        dst = os.path.join(backup_dir, name)
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
        copied.append(dst)
    return copied
