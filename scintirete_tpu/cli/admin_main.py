"""scintirete-tpu-admin: offline data-directory administration.

Exposes the BackupManager (reference: internal/persistence/rdb/rdb.go:890-979
— timestamped snapshot copies) plus an AOF/RDB inspection command. These
operate directly on the server's data directory and are meant to run on the
server host (the wire protocol has no backup RPCs in the reference either).

    scintirete-tpu-admin -data-dir ./data backup create
    scintirete-tpu-admin -data-dir ./data backup list
    scintirete-tpu-admin -data-dir ./data backup restore <path>
    scintirete-tpu-admin -data-dir ./data inspect
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="scintirete-tpu-admin")
    parser.add_argument("-data-dir", "--data-dir", default="./data",
                        help="server persistence data directory")
    parser.add_argument("-rdb", "--rdb", default="vector.rdb",
                        help="RDB filename inside the data dir")
    parser.add_argument("-aof", "--aof", default="appendonly.aof",
                        help="AOF filename inside the data dir")
    sub = parser.add_subparsers(dest="cmd", required=True)

    backup = sub.add_parser("backup", help="manage RDB snapshot backups")
    bsub = backup.add_subparsers(dest="action", required=True)
    bsub.add_parser("create", help="copy the current snapshot to backups/")
    bsub.add_parser("list", help="list existing backups")
    restore = bsub.add_parser("restore", help="restore a backup over the RDB")
    restore.add_argument("path", help="backup file path (from `backup list`)")

    sub.add_parser("inspect", help="print AOF/RDB stats as JSON")

    args = parser.parse_args(argv)

    from scintirete_tpu.errors import ScintireteError
    from scintirete_tpu.persistence.rdb import BackupManager, RDBManager

    rdb = RDBManager(os.path.join(args.data_dir, args.rdb))
    try:
        if args.cmd == "backup":
            mgr = BackupManager(rdb)
            if args.action == "create":
                dest = mgr.create_backup()
                print(dest)
            elif args.action == "list":
                for path in mgr.list_backups():
                    print(path)
            else:  # restore
                mgr.restore_backup(args.path)
                print(f"restored {args.path} -> {rdb.path}")
        else:  # inspect
            aof_path = os.path.join(args.data_dir, args.aof)
            info = {
                "rdb": {
                    "path": rdb.path,
                    "exists": rdb.exists(),
                    "size_bytes": rdb.size_bytes(),
                },
                "aof": {
                    "path": aof_path,
                    "exists": os.path.exists(aof_path),
                    "size_bytes": (
                        os.path.getsize(aof_path)
                        if os.path.exists(aof_path)
                        else 0
                    ),
                },
                "backups": BackupManager(rdb).list_backups(),
            }
            print(json.dumps(info, indent=2))
    except ScintireteError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    except BrokenPipeError:  # output piped into head etc.
        return 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
