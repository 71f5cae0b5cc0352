package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** An in-process MySQL-protocol binlog server for BinlogDumpClient
  * tests: speaks the PUBLIC server side of the dialogue the client
  * implements — v10 initial handshake with a real scramble,
  * mysql_native_password verification (wrong proof → ERR 1045),
  * COM_REGISTER_SLAVE, and COM_BINLOG_DUMP serving the raw events of
  * the wire files under `wireDir` (FDE first, then events from the
  * requested offset, then every later file verbatim, then the
  * NON_BLOCK caught-up EOF). The serving side reads event boundaries
  * straight from the v4 headers, so CRC trailers and carriers travel
  * byte-exact — what the client hands to fromWireSegments is what the
  * files contain. */
final class FakeMysqlBinlogServer(wireDir: String, user: String,
    password: String) {

  private val server = new java.net.ServerSocket(0)
  def port: Int = server.getLocalPort

  private val accepter = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock))
      t.setDaemon(true)
      t.start()
    } catch { case _: Exception => () } // server closed
  })
  accepter.setDaemon(true)
  accepter.start()

  def close(): Unit = server.close()

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray

  /** (startOffset, rawBytes) per event, straight off the v4 headers. */
  private def rawEvents(f: java.io.File): Vector[(Long, Array[Byte])] = {
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    require(bytes.length >= 4, s"truncated wire file $f")
    var off = 4
    val out = Vector.newBuilder[(Long, Array[Byte])]
    while (off + 13 <= bytes.length) {
      val len = (bytes(off + 9) & 0xFF) | ((bytes(off + 10) & 0xFF) << 8) |
        ((bytes(off + 11) & 0xFF) << 16) | ((bytes(off + 12) & 0xFF) << 24)
      out += ((off.toLong, bytes.slice(off, off + len)))
      off += len
    }
    out.result()
  }

  private final class PacketIO(sock: java.net.Socket) {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    private val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    var seq: Int = 0
    def read(): Array[Byte] = {
      val hdr = new Array[Byte](4)
      in.readFully(hdr)
      val len = (hdr(0) & 0xFF) | ((hdr(1) & 0xFF) << 8) |
        ((hdr(2) & 0xFF) << 16)
      seq = (hdr(3) & 0xFF) + 1
      val buf = new Array[Byte](len)
      in.readFully(buf)
      buf
    }
    def write(payload: Array[Byte]): Unit = {
      out.write(payload.length & 0xFF)
      out.write((payload.length >> 8) & 0xFF)
      out.write((payload.length >> 16) & 0xFF)
      out.write(seq & 0xFF)
      out.write(payload)
      out.flush()
      seq += 1
    }
  }

  private def ok(): Array[Byte] =
    Array(0x00.toByte, 0x00.toByte, 0x00.toByte) ++ le(2L, 2) ++ le(0L, 2)

  private def err(code: Int, sqlState: String, msg: String): Array[Byte] =
    Array(0xFF.toByte) ++ le(code.toLong, 2) ++ Array('#'.toByte) ++
      sqlState.getBytes(UTF_8) ++ msg.getBytes(UTF_8)

  private def serve(sock: java.net.Socket): Unit = {
    val io = new PacketIO(sock)
    try {
      // deterministic 20-byte scramble (auth1 8 + auth2 12)
      val scramble = (1 to 20).map(i => (i * 7 + 3).toByte).toArray
      io.seq = 0
      io.write(Array(10.toByte) ++
        "8.0.32-fake".getBytes(UTF_8) ++ Array(0.toByte) ++
        le(99L, 4) ++ scramble.take(8) ++ Array(0.toByte) ++
        le(0x8201L, 2) ++ Array(33.toByte) ++ le(2L, 2) ++ le(0x8L, 2) ++
        Array(21.toByte) ++ new Array[Byte](10) ++
        scramble.drop(8) ++ Array(0.toByte) ++
        "mysql_native_password".getBytes(UTF_8) ++ Array(0.toByte))
      val resp = io.read()
      var i = 4 + 4 + 1 + 23 // caps, max packet, charset, reserved
      val userEnd = resp.indexOf(0.toByte, i)
      val gotUser = new String(resp.slice(i, userEnd), UTF_8)
      i = userEnd + 1
      val authLen = resp(i) & 0xFF
      i += 1
      val gotAuth = resp.slice(i, i + authLen)
      val wantAuth = BinlogDumpClient.nativePassword(password, scramble)
      if (gotUser != user || !java.util.Arrays.equals(gotAuth, wantAuth)) {
        io.write(err(1045, "28000", s"Access denied for user '$gotUser'"))
        return
      }
      io.write(ok())
      var open = true
      while (open) {
        io.seq = 0
        val cmd = io.read()
        cmd.headOption.map(_ & 0xFF) match {
          case Some(0x15) => io.write(ok()) // COM_REGISTER_SLAVE
          case Some(0x12) => // COM_BINLOG_DUMP
            val pos = (cmd(1) & 0xFFL) | ((cmd(2) & 0xFFL) << 8) |
              ((cmd(3) & 0xFFL) << 16) | ((cmd(4) & 0xFFL) << 24)
            // flags(2) + serverId(4) then the file name
            val file = new String(cmd.drop(11), UTF_8)
            val files = new java.io.File(wireDir).listFiles()
              .filter(f => f.isFile && f.getName.startsWith("binlog."))
              .sortBy(_.getName).dropWhile(_.getName < file)
            if (files.isEmpty || files.head.getName != file)
              io.write(err(1236, "HY000",
                s"Could not find first log file name in binary log index file: $file"))
            else {
              // FDE=15 TABLE_MAP=19 PREVIOUS_GTIDS=35 ROTATE=4: the
              // file's self-describing prologue. A real server re-sends
              // only the FDE (its files re-declare TABLE_MAP per
              // statement); this engine's files declare maps once per
              // file, so a mid-file dump re-serves the head prologue
              // too — same adaptation the catalog's seekTso documents
              val preamble = Set(15, 19, 35, 4)
              files.zipWithIndex.foreach { case (f, fi) =>
                val evs = rawEvents(f)
                val head =
                  evs.takeWhile(e => preamble.contains(e._2(4) & 0xFF))
                val body = evs
                  .dropWhile(e => preamble.contains(e._2(4) & 0xFF))
                  .filter(e => fi > 0 || e._1 >= pos)
                (head ++ body).foreach { case (_, bytes) =>
                  io.write(Array(0x00.toByte) ++ bytes)
                }
              }
              io.write(Array(0xFE.toByte) ++ le(0L, 2) ++ le(2L, 2))
            }
          case Some(0x01) | None => open = false // COM_QUIT / closed
          case Some(other) =>
            io.write(err(1047, "08S01", s"Unknown command $other"))
        }
      }
    } catch {
      case _: Exception => () // connection dropped — fine for tests
    } finally sock.close()
  }
}
