"""Print each .eml file's Date header as a hex-encoded POSIX timestamp.

(Parity: reference tools/mail/pt.py — used to spot-order dumped mailboxes;
the value is milliseconds-since-epoch shifted left 20 bits, the reference's
sortable-id convention.) Run:
``python -m typeagent_tpu.tools.mail.print_timestamps *.eml``.
"""

from __future__ import annotations

import email
import email.utils
import sys


def hex_timestamp(date_header: str | None) -> str:
    parsed = email.utils.parsedate_tz(date_header or "")
    if parsed is None:
        return "?" * 8
    return f"{int(email.utils.mktime_tz(parsed)) * 1000 << 20:016x}"


def main() -> None:
    for path in sys.argv[1:]:
        with open(path, "rb") as f:
            msg = email.message_from_binary_file(f)
        print(f"{hex_timestamp(msg['Date'])}  {path}")


if __name__ == "__main__":
    main()
