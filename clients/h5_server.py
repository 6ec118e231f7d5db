#!/usr/bin/env python3
"""Static HTTPS/HTTP server for the browser demo (h5Server.py role).

Mic capture requires a secure context; pass --cert/--key for HTTPS."""
from __future__ import annotations

import argparse
import http.server
import os
import ssl


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8001)
    p.add_argument("--cert", default="")
    p.add_argument("--key", default="")
    args = p.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "html"))
    httpd = http.server.HTTPServer(("0.0.0.0", args.port),
                                   http.server.SimpleHTTPRequestHandler)
    if args.cert:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(args.cert, args.key or None)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
        print(f"https://0.0.0.0:{args.port}")
    else:
        print(f"http://0.0.0.0:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
