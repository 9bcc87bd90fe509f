package graft.examples
object PHashDebug {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val base = Multimodal.blockPatternPng(10L, 8, paired = true, isCopy = false)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new java.io.ByteArrayInputStream(base))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    println("readers.hasNext=" + readers.hasNext)
    try {
      val img = javax.imageio.ImageIO.read(iis)
      println("read ok: " + img)
    } catch { case e: Throwable => println("read threw: " + e) }
    // second attempt with a FRESH stream (in case position was consumed)
    val iis2 = new javax.imageio.stream.MemoryCacheImageInputStream(new java.io.ByteArrayInputStream(base))
    try println("read2: " + javax.imageio.ImageIO.read(iis2))
    catch { case e: Throwable => println("read2 threw: " + e) }
  }
}
