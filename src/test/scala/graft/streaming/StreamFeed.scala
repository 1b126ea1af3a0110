package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Shared file-source feed for streaming specs: copies a chunk's parquet
  * part files into the watched dir ATOMICALLY — first to a dot-prefixed
  * temp name (the file stream source ignores hidden files), then an atomic
  * same-filesystem rename — so a query polling between
  * processAllAvailable() calls can never read a torn file. */
object StreamFeed {
  def feed(srcDir: String, dstDir: String, prefix: String): Unit = {
    val dst = new java.io.File(dstDir)
    dst.mkdirs()
    new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        val tmp = Paths.get(dstDir, s".tmp-$prefix-${f.getName}")
        Files.copy(f.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, Paths.get(dstDir, s"$prefix-${f.getName}"),
          StandardCopyOption.ATOMIC_MOVE)
      }
  }
}
